"""Sparse full-graph path: COO ops vs dense reference, sparse Lanczos,
sparse runner end-to-end (ROADMAP.md #2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosnet_tpu.data.citation import synthetic_citation_graph
from lanczosnet_tpu.ops.lanczos import lanczos_ritz
from lanczosnet_tpu.ops.sparse import (
    sparse_diffusion_features,
    sparse_lanczos_ritz,
    sparse_sym_operator,
    spmv,
)
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import AttrDict


def small_sparse_and_dense(seed=0, scale=0.08):
    g = synthetic_citation_graph("cora", seed=seed, scale=scale)
    n = g["labels"].shape[0]
    edges = np.argwhere(np.triu(g["adj"], 1) > 0)
    op = sparse_sym_operator(edges, n)
    # dense reference operator
    a = g["adj"]
    deg = a.sum(-1)
    inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    s = a * inv[:, None] * inv[None, :]
    return op, jnp.asarray(s), n


def test_spmv_matches_dense():
    op, s, n = small_sparse_and_dense()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmv(op, x)), np.asarray(s @ x), atol=1e-4
    )
    v = x[:, 0]
    np.testing.assert_allclose(
        np.asarray(spmv(op, v)), np.asarray(s @ v), atol=1e-4
    )


def test_sparse_diffusion_matches_dense_powers():
    op, s, n = small_sparse_and_dense()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    feats = sparse_diffusion_features(op, x, (1, 3))
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(s @ x),
                               atol=1e-4)
    s3 = np.asarray(s @ (s @ (s @ x)))
    np.testing.assert_allclose(np.asarray(feats[1]), s3, atol=1e-3)


def test_sparse_lanczos_matches_dense_lanczos():
    op, s, n = small_sparse_and_dense()
    k = 8
    d_sp, v_sp = sparse_lanczos_ritz(op, k)
    d_d, v_d = lanczos_ritz(s, jnp.ones(n), k)
    # same recursion, same start vector → same Ritz values
    np.testing.assert_allclose(np.asarray(d_sp), np.asarray(d_d), atol=1e-3)
    rec_sp = np.asarray(v_sp) @ np.diag(np.asarray(d_sp)) @ np.asarray(v_sp).T
    rec_d = np.asarray(v_d) @ np.diag(np.asarray(d_d)) @ np.asarray(v_d).T
    np.testing.assert_allclose(rec_sp, rec_d, atol=1e-3)


@pytest.mark.parametrize("name,kw", [
    ("GCN", {}),
    ("LanczosNet", {"num_eig_vec": 6, "short_diffusion_dist": [1, 2],
                    "long_diffusion_dist": [3, 5]}),
])
def test_sparse_citation_runner_end_to_end(tmp_path, name, kw):
    import pathlib

    cfg = AttrDict.convert(
        {
            "exp_name": f"sp_{name}",
            "runner": "SparseCitationRunner",
            "seed": 0,
            "save_dir": str(tmp_path / name),
            "dataset": {"source": "synthetic", "name": "cora", "scale": 0.08},
            "model": {"name": name, "hidden_dim": [32], **kw},
            "train": {"optimizer": "Adam", "lr": 1e-2, "max_epoch": 40,
                      "patience": 40, "display_iter": 20},
            "test": {},
        }
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    res = build_runner(cfg).train()
    assert res["best_val_acc"] > 1.0 / 7 + 0.05  # beats class prior
    assert 0.0 <= res["test_acc"] <= 1.0


def test_synthetic_edges_generator():
    from lanczosnet_tpu.data.citation import synthetic_citation_edges

    g = synthetic_citation_edges(2000, num_class=5, feat_dim=32, seed=1)
    e = g["edges"]
    assert e.ndim == 2 and e.shape[1] == 2
    assert (e[:, 0] != e[:, 1]).all()
    assert (e[:, 0] < e[:, 1]).all()  # canonical undirected form, deduped
    assert g["features"].shape == (2000, 32)
    # homophily holds
    lab = g["labels"]
    same = (lab[e[:, 0]] == lab[e[:, 1]]).mean()
    assert same > 0.5
    assert g["train_mask"].sum() == 5 * 20


def test_sparse_runner_synthetic_edges(tmp_path):
    import pathlib

    cfg = AttrDict.convert(
        {
            "exp_name": "sp_edges",
            "runner": "SparseCitationRunner",
            "seed": 0,
            "save_dir": str(tmp_path / "edges"),
            "dataset": {"source": "synthetic_edges", "num_nodes": 3000,
                        "num_class": 5, "feat_dim": 32},
            "model": {"name": "GCN", "hidden_dim": [32]},
            "train": {"optimizer": "Adam", "lr": 1e-2, "max_epoch": 30,
                      "patience": 30, "display_iter": 20},
            "test": {},
        }
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    res = build_runner(cfg).train()
    assert res["best_val_acc"] > 1.0 / 5 + 0.05
