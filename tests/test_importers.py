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


def _write_planetoid(tmp_path, name, allx, ally, x, y, tx, ty, graph,
                     test_index_lines):
    """Write a byte-faithful Planetoid file set: the real ``ind.*``
    files are python2 pickles (protocol <=2, loaded latin1) holding
    scipy.sparse CSR matrices for features, dense one-hot int arrays
    for labels, and a collections.defaultdict(list) adjacency;
    ``test.index`` is newline-separated ids in SHUFFLED file order."""
    import collections

    import scipy.sparse as sp

    gd = collections.defaultdict(list)
    gd.update(graph)
    parts = [
        ("x", sp.csr_matrix(x)), ("y", np.asarray(y, np.int32)),
        ("tx", sp.csr_matrix(tx)), ("ty", np.asarray(ty, np.int32)),
        ("allx", sp.csr_matrix(allx)), ("ally", np.asarray(ally, np.int32)),
        ("graph", gd),
    ]
    for part, obj in parts:
        with open(tmp_path / f"ind.{name}.{part}", "wb") as fh:
            pickle.dump(obj, fh, protocol=2)  # py2-compatible stream
    (tmp_path / f"ind.{name}.test.index").write_text(
        "\n".join(str(i) for i in test_index_lines) + "\n"
    )


def test_planetoid_importer_cora_layout(tmp_path):
    """Mirror of the real cora layout at toy scale: allx rows first,
    test nodes the contiguous tail range, test.index SHUFFLED (as the
    real file is), features sparse CSR, labels one-hot int."""
    rng = np.random.default_rng(0)
    f, c = 5, 3
    allx = (rng.random((8, f)) < 0.3).astype(np.float32)
    ally = np.eye(c)[[0, 1, 2, 0, 1, 2, 0, 1]]
    tx = (rng.random((4, f)) < 0.3).astype(np.float32)
    ty = np.eye(c)[[1, 2, 0, 1]]
    x, y = allx[:3], ally[:3]
    graph = {
        0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: [5], 5: [4],
        6: [7], 7: [6, 8], 8: [7], 9: [10], 10: [9, 11], 11: [10],
    }
    # file order 10, 8, 11, 9 — tx row i belongs to node test_index[i]
    test_index = [10, 8, 11, 9]
    _write_planetoid(tmp_path, "tinycora", allx, ally, x, y, tx, ty,
                     graph, test_index)

    g = import_planetoid(tmp_path, "tinycora")
    assert g["features"].shape == (12, f)
    assert g["num_class"] == c
    assert g["adj"].shape == (12, 12)
    np.testing.assert_allclose(g["adj"], g["adj"].T)
    assert g["train_mask"].sum() == 3
    assert sorted(np.nonzero(g["test_mask"])[0].tolist()) == [8, 9, 10, 11]
    # the shuffled-file-order correspondence: node test_index[i] <- tx[i]
    for i, node in enumerate(test_index):
        np.testing.assert_allclose(g["features"][node], tx[i])
        assert g["labels"][node] == int(np.argmax(ty[i]))


def test_planetoid_importer_citeseer_isolated_nodes(tmp_path):
    """The citeseer quirk: some ids inside the test range are MISSING
    from test.index (isolated papers). They must come back with zero
    features, no edges, and excluded from every mask — exactly what the
    public Kipf loader's tx_extended zero-fill produces."""
    rng = np.random.default_rng(1)
    f, c = 4, 2
    allx = (rng.random((6, f)) < 0.4).astype(np.float32)
    ally = np.eye(c)[[0, 1, 0, 1, 0, 1]]
    x, y = allx[:2], ally[:2]
    # test range is 6..9 but ids 7 and 8 are isolated (absent)
    tx = (rng.random((2, f)) < 0.4).astype(np.float32)
    ty = np.eye(c)[[1, 0]]
    test_index = [9, 6]  # shuffled, with gaps
    graph = {0: [1], 1: [0], 2: [3], 3: [2], 4: [5], 5: [4],
             6: [0], 9: [1]}  # isolated 7, 8 have no entries
    _write_planetoid(tmp_path, "tinycite", allx, ally, x, y, tx, ty,
                     graph, test_index)

    g = import_planetoid(tmp_path, "tinycite")
    assert g["features"].shape == (10, f)
    np.testing.assert_allclose(g["features"][9], tx[0])
    np.testing.assert_allclose(g["features"][6], tx[1])
    # isolated nodes: zero features, zero degree, in no split
    for iso in (7, 8):
        np.testing.assert_allclose(g["features"][iso], 0.0)
        assert g["adj"][iso].sum() == 0
        assert not g["train_mask"][iso]
        assert not g["test_mask"][iso]
    assert sorted(np.nonzero(g["test_mask"])[0].tolist()) == [6, 9]


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
