"""External-data importers: reference QM8 pickles, Planetoid files, CLI."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from lanczosnet_tpu.data.citation import import_planetoid
from lanczosnet_tpu.data.qm8 import import_reference_pickles


def test_reference_pickle_importer(tmp_path):
    # reference-style records: one-hot-free atom list, [N,N,E] operator
    # stack (trailing edge axis), target vector
    records = [
        {
            "atom_type": np.array([2, 3, 1]),
            "adj": np.moveaxis(np.ones((2, 3, 3), np.float32), 0, -1),
            "label": np.arange(4, dtype=np.float32),
        },
        {
            "atoms": np.array([1, 1]),
            "A": np.ones((2, 2, 2), np.float32),
            "target": np.ones(4, np.float32),
        },
    ]
    p = tmp_path / "split.p"
    with open(p, "wb") as f:
        pickle.dump(records, f)
    graphs = import_reference_pickles(p)
    assert len(graphs) == 2
    assert graphs[0]["atom_type"].tolist() == [3, 4, 2]  # +1 for padding id
    assert graphs[0]["adj"].shape == (2, 3, 3)
    assert graphs[1]["adj"].shape == (2, 2, 2)
    np.testing.assert_array_equal(graphs[0]["label"], np.arange(4))


def test_reference_pickle_unknown_keys(tmp_path):
    p = tmp_path / "bad.p"
    with open(p, "wb") as f:
        pickle.dump([{"foo": 1}], f)
    with pytest.raises(KeyError, match="foo"):
        import_reference_pickles(p)


def test_planetoid_importer(tmp_path):
    # construct a tiny consistent Planetoid file set: 6 nodes,
    # 2 train (x), 4 in allx, 2 test via test.index
    rng = np.random.default_rng(0)
    f, c = 5, 3
    allx = rng.random((4, f)).astype(np.float32)
    ally = np.eye(c, dtype=np.float32)[[0, 1, 2, 0]]
    tx = rng.random((2, f)).astype(np.float32)
    ty = np.eye(c, dtype=np.float32)[[1, 2]]
    x, y = allx[:2], ally[:2]
    graph = {0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: [5], 5: [4]}
    name = "tiny"
    for part, obj in [
        ("x", x), ("y", y), ("tx", tx), ("ty", ty),
        ("allx", allx), ("ally", ally), ("graph", graph),
    ]:
        with open(tmp_path / f"ind.{name}.{part}", "wb") as fh:
            pickle.dump(obj, fh)
    (tmp_path / f"ind.{name}.test.index").write_text("4\n5\n")

    g = import_planetoid(tmp_path, name)
    assert g["features"].shape == (6, f)
    assert g["num_class"] == c
    assert g["adj"].shape == (6, 6)
    np.testing.assert_allclose(g["adj"], g["adj"].T)
    assert g["train_mask"].sum() == 2
    assert g["test_mask"].tolist() == [False] * 4 + [True] * 2
    np.testing.assert_allclose(g["features"][4:], tx)
    assert g["labels"][4:].tolist() == [1, 2]


def test_cli_end_to_end(tmp_path):
    """run_exp.py trains + tests from a config via subprocess (CPU)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
exp_name: cli_smoke
runner: QM8Runner
seed: 0
exp_dir: {tmp_path}/exp
dataset:
  source: synthetic
  n_max: 10
  num_atom: 8
  num_train: 32
  num_val: 16
  num_test: 16
model:
  name: GCN
  hidden_dim: [16]
  embed_dim: 16
train:
  optimizer: Adam
  lr: 1.0e-3
  batch_size: 8
  max_epoch: 1
  display_iter: 100
test:
  test_model: null
"""
    )
    env = dict(
        os.environ,
        JAX_PLATFORM_NAME="cpu",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo,
    )
    out = subprocess.run(
        [sys.executable, "run_exp.py", "-c", str(cfg)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "done:" in out.stdout
