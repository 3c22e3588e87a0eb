"""Data pipeline tests: generator, packing, standardization, loader,
partitioning (SURVEY.md §4 test plan: collate/padding invariance etc.)."""

import numpy as np
import pytest

from lanczosnet_tpu.data.dataset import (
    LabelStats,
    load_packed,
    pack_dataset,
    save_packed,
)
from lanczosnet_tpu.data.loader import BatchLoader
from lanczosnet_tpu.data.partition import spectral_partition
from lanczosnet_tpu.data.qm8 import NUM_EDGE_TYPE, NUM_TASK, synthetic_qm8_graphs


def test_synthetic_deterministic_and_schema():
    a = synthetic_qm8_graphs(5, seed=3)
    b = synthetic_qm8_graphs(5, seed=3)
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(ga["atom_type"], gb["atom_type"])
        np.testing.assert_array_equal(ga["adj"], gb["adj"])
        np.testing.assert_array_equal(ga["label"], gb["label"])
    g = a[0]
    n = g["atom_type"].shape[0]
    assert g["adj"].shape == (NUM_EDGE_TYPE, n, n)
    assert g["label"].shape == (NUM_TASK,)
    # symmetric, connected union graph
    union = g["adj"].sum(0)
    np.testing.assert_allclose(union, union.T)
    # BFS connectivity
    seen = {0}
    frontier = [0]
    while frontier:
        i = frontier.pop()
        for j in np.nonzero(union[i])[0]:
            if j not in seen:
                seen.add(int(j))
                frontier.append(int(j))
    assert len(seen) == n


def test_pack_roundtrip(tmp_path):
    graphs = synthetic_qm8_graphs(6, seed=0, n_hi=10)
    ds = pack_dataset(graphs, n_max=12, num_eig_vec=4, num_cluster=2,
                      standardize=True)
    assert ds.ritz_val.shape == (6, 4)
    assert ds.ritz_vec.shape == (6, 12, 4)
    assert ds.cluster.shape == (6, 12)
    p = tmp_path / "split.npz"
    save_packed(ds, p)
    ds2 = load_packed(p)
    np.testing.assert_array_equal(ds.ops, ds2.ops)
    np.testing.assert_array_equal(ds.label, ds2.label)
    np.testing.assert_array_equal(ds.ritz_vec, ds2.ritz_vec)
    np.testing.assert_allclose(ds.stats.mean, ds2.stats.mean)


def test_label_standardization_roundtrip():
    labels = np.random.default_rng(0).normal(2.0, 3.0, size=(50, 4)).astype(
        np.float32
    )
    stats = LabelStats.fit(labels)
    std = stats.standardize(labels)
    assert abs(std.mean()) < 1e-5
    mae_std = np.abs(std - std.mean(0)).mean(0)
    # unstandardized MAE == MAE computed in original units
    mae_orig = np.abs(labels - labels.mean(0)).mean(0)
    np.testing.assert_allclose(stats.unstandardize_mae(mae_std), mae_orig, rtol=1e-4)


def test_loader_covers_each_graph_once_with_ghost_tail():
    graphs = synthetic_qm8_graphs(10, seed=1, n_hi=8)
    ds = pack_dataset(graphs, n_max=10)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=False, seed=0)
    assert len(loader) == 3
    seen_labels = []
    ghost_count = 0
    for batch, valid in loader.epoch():
        assert batch.mask.shape[0] == 4
        for i in range(4):
            if valid[i]:
                seen_labels.append(tuple(np.asarray(batch.label[i])))
            else:
                ghost_count += 1
                assert batch.mask[i].sum() == 0  # ghosts fully masked
    assert ghost_count == 2
    assert len(set(seen_labels)) == 10


def test_loader_drop_last():
    graphs = synthetic_qm8_graphs(10, seed=1, n_hi=8)
    ds = pack_dataset(graphs, n_max=10)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader.epoch())
    assert len(batches) == 2
    assert all(v.all() for _, v in batches)


def test_spectral_partition_two_blobs():
    # two 4-cliques joined by one edge → the natural 2-partition
    n = 8
    a = np.zeros((n, n), np.float32)
    a[:4, :4] = 1.0
    a[4:, 4:] = 1.0
    np.fill_diagonal(a, 0)
    a[3, 4] = a[4, 3] = 1.0
    deg = a.sum(-1)
    s = a / np.sqrt(np.outer(deg, deg))
    mask = np.ones(n, np.float32)
    labels = spectral_partition(s, mask, 2)
    assert len(set(labels[:4])) == 1
    assert len(set(labels[4:])) == 1
    assert labels[0] != labels[7]


def test_spectral_partition_padded():
    n = 6
    op = np.zeros((n, n), np.float32)
    op[:3, :3] = 0.5
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    labels = spectral_partition(op, mask, 2)
    assert labels.shape == (n,)
    assert (labels[3:] == 0).all()
