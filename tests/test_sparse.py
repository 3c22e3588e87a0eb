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


def test_row_stochastic_spmv_matches_dense():
    from lanczosnet_tpu.ops.sparse import sparse_row_stochastic_operator

    g = synthetic_citation_graph("cora", seed=3, scale=0.08)
    n = g["labels"].shape[0]
    edges = np.argwhere(np.triu(g["adj"], 1) > 0)
    op = sparse_row_stochastic_operator(edges, n)
    a = g["adj"]
    p = a / np.maximum(a.sum(-1, keepdims=True), 1.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmv(op, x)), np.asarray(p @ np.asarray(x)), atol=1e-4
    )


def test_mean_spmv_matches_dense_mean():
    from lanczosnet_tpu.ops.sparse import mean_spmv

    op, s, n = small_sparse_and_dense(seed=5)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    support = (np.asarray(s) > 0).astype(np.float32)
    mean = support @ np.asarray(x) / np.maximum(
        support.sum(-1, keepdims=True), 1.0
    )
    np.testing.assert_allclose(np.asarray(mean_spmv(op, x)), mean, atol=1e-5)


def test_sym_normalize_coo_matches_dense():
    from lanczosnet_tpu.ops.normalize import sym_normalize
    from lanczosnet_tpu.ops.sparse import sym_normalize_coo

    op, s, n = small_sparse_and_dense(seed=7)
    rng = np.random.default_rng(4)
    # a positive per-edge kernel, symmetric (k_ij == k_ji)
    kv = rng.random(op.val.shape[0]).astype(np.float32) + 0.1
    row, col = np.asarray(op.row), np.asarray(op.col)
    dense_k = np.zeros((n, n), np.float32)
    dense_k[row, col] = kv
    dense_k = 0.5 * (dense_k + dense_k.T)
    kv_sym = dense_k[row, col]
    lop = sym_normalize_coo(op, jnp.asarray(kv_sym))
    dense = np.asarray(
        sym_normalize(jnp.asarray(dense_k)[None], jnp.ones((1, n)))
    )[0]
    got = np.zeros((n, n), np.float32)
    got[row, col] = np.asarray(lop.val)
    np.testing.assert_allclose(got, dense, atol=1e-5)


def test_sparse_gpnn_needs_cut_step():
    """Cross-partition Jacobian is exactly zero without cut steps and
    nonzero with them — the sparse analog of tests/test_gpnn_schedule.py."""
    import jax

    from lanczosnet_tpu.models.sparse_nodes import SparseGPNN

    # line graph 0-1-2-3, partition {0,1} | {2,3}
    edges = np.array([[0, 1], [1, 2], [2, 3]])
    op = sparse_sym_operator(edges, 4)
    part = jnp.asarray([0, 0, 1, 1], jnp.int32)
    x = jnp.asarray(np.eye(4, 3, dtype=np.float32))

    def probe(num_cut):
        model = SparseGPNN(
            hidden_dim=(8,), num_class=2, num_prop=2,
            num_intra_prop=1, num_cut_prop=num_cut, dropout=0.0,
        )
        params = model.init(
            jax.random.PRNGKey(0), x, op, part, deterministic=True
        )["params"]

        def out_of_in(xin):
            logits = model.apply(
                {"params": params}, xin, op, part, deterministic=True
            )
            return logits[3]  # node in partition 1

        jac = jax.jacobian(out_of_in)(x)  # [C, N, F]
        return np.abs(np.asarray(jac[:, 0])).max()  # wrt node 0 (part 0)

    assert probe(0) == 0.0
    assert probe(1) > 1e-6


def test_sparse_ada_lanczos_grads_flow():
    """Gradients reach the learned kernel through the in-forward sparse
    Lanczos (the whole point of AdaLanczosNet)."""
    import jax

    from lanczosnet_tpu.models.sparse_nodes import SparseAdaLanczosNet

    op, _, n = small_sparse_and_dense(seed=9)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
    model = SparseAdaLanczosNet(
        hidden_dim=(8,), num_class=3, kernel_dim=4, num_eig_vec=5,
        short_diffusion_dist=(1,), long_diffusion_dist=(3,), dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0), x, op, deterministic=True)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x, op, deterministic=True) ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["kernel_embed"]["kernel"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0.0


@pytest.mark.parametrize("name,kw", [
    ("GCN", {}),
    ("LanczosNet", {"num_eig_vec": 6, "short_diffusion_dist": [1, 2],
                    "long_diffusion_dist": [3, 5]}),
    ("DCNN", {"max_hop": 2}),
    ("GraphSAGE", {}),
    ("MPNN", {"num_prop": 2}),
    ("GPNN", {"num_partition": 2, "num_prop": 2}),
    ("AdaLanczosNet", {"num_eig_vec": 6, "kernel_dim": 8,
                       "short_diffusion_dist": [1, 2],
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


def test_sparse_runner_scanned_epochs_match_per_epoch(tmp_path):
    """`train.valid_epoch: k` folds k epochs into one lax.scan program;
    with dropout off the trajectory must equal the per-epoch path's."""
    import pathlib

    def run(tag, valid_epoch):
        cfg = AttrDict.convert(
            {
                "exp_name": f"scan_{tag}",
                "runner": "SparseCitationRunner",
                "seed": 0,
                "save_dir": str(tmp_path / tag),
                "dataset": {
                    "source": "synthetic", "name": "cora", "scale": 0.08,
                },
                "model": {"name": "GCN", "hidden_dim": [32], "dropout": 0.0},
                "train": {
                    "optimizer": "Adam", "lr": 1e-2, "max_epoch": 12,
                    "patience": 40, "display_iter": 50,
                    "valid_epoch": valid_epoch,
                },
                "test": {},
            }
        )
        pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
        return build_runner(cfg).train()

    per_epoch = run("per_epoch", 1)
    scanned = run("scanned", 4)
    # same seed, no dropout → same 12-step trajectory → same test acc
    # (best-val snapshots differ only in validation granularity)
    assert abs(per_epoch["test_acc"] - scanned["test_acc"]) < 0.05
    assert scanned["best_val_acc"] > 1.0 / 7 + 0.05


def test_sparse_bf16_compute_matches_f32():
    """`dtype=bfloat16` keeps params + spectral core f32; outputs must
    track the f32 forward within bf16 resolution and grads must flow."""
    import jax
    import optax
    from lanczosnet_tpu.data.citation import synthetic_citation_edges
    from lanczosnet_tpu.models.sparse_nodes import (
        SparseGCN,
        SparseLanczosNet,
    )
    from lanczosnet_tpu.ops.sparse import (
        sparse_lanczos_ritz,
        sparse_sym_operator,
    )

    g = synthetic_citation_edges(80, num_class=3, feat_dim=8, seed=0)
    op = sparse_sym_operator(g["edges"], 80)
    x = jnp.asarray(g["features"])
    y = jnp.asarray(g["labels"].astype(np.int32))
    ritz = sparse_lanczos_ritz(op, 8)

    for name, mk, args in (
        ("gcn", lambda dt: SparseGCN(
            hidden_dim=(16,), num_class=3, dropout=0.0, dtype=dt), (x, op)),
        ("lnet", lambda dt: SparseLanczosNet(
            hidden_dim=(16,), num_class=3, short_diffusion_dist=(1,),
            long_diffusion_dist=(3,), dropout=0.0, dtype=dt),
         (x, op, *ritz)),
    ):
        m32, m16 = mk(jnp.float32), mk(jnp.bfloat16)
        params = m32.init(jax.random.PRNGKey(0), *args)["params"]
        # params are f32 in BOTH precisions (compute-only cast)
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree.leaves(m16.init(jax.random.PRNGKey(0), *args))
        )
        out32 = m32.apply({"params": params}, *args)
        out16 = m16.apply({"params": params}, *args)
        assert out16.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(out32))) + 1e-6
        err = float(jnp.max(jnp.abs(out32 - out16.astype(jnp.float32))))
        assert err / scale < 0.1, (name, err, scale)

        def loss(p):
            logits = m16.apply({"params": p}, *args).astype(jnp.float32)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        grads = jax.jit(jax.grad(loss))(params)
        gn = jax.tree_util.tree_reduce(
            lambda a, v: a + jnp.sum(jnp.square(v.astype(jnp.float32))),
            grads, 0.0,
        ) ** 0.5
        assert np.isfinite(float(gn)) and float(gn) > 0, name


def test_sum_dense_equals_concat_dense():
    """SumDense(parts) == Dense(concat(parts)) with the SAME param tree
    (same kernel init draw, same shapes) — the layer that removes the
    [N, sum F] concat and its cotangent from the sparse models' HBM
    footprint. Equality is to f32-accumulation tolerance (partial
    products accumulate f32; the concat matmul does the same inside
    the MXU)."""
    import jax
    import flax.linen as nn
    from lanczosnet_tpu.models.base import SumDense

    rng = jax.random.PRNGKey(3)
    k1, k2, k3, kp = jax.random.split(rng, 4)
    parts = [
        jax.random.normal(k1, (40, 7)),
        jax.random.normal(k2, (40, 5)),
        jax.random.normal(k3, (40, 7)),
    ]
    cat = jnp.concatenate(parts, axis=-1)

    sum_m = SumDense(11)
    dense_m = nn.Dense(11)
    p_sum = sum_m.init(kp, parts)["params"]
    p_dense = dense_m.init(kp, cat)["params"]
    # identical param trees AND identical init values (same PRNG draw)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p_sum, p_dense,
    )

    out_sum = sum_m.apply({"params": p_sum}, parts)
    out_cat = dense_m.apply({"params": p_dense}, cat)
    np.testing.assert_allclose(
        np.asarray(out_sum), np.asarray(out_cat), rtol=1e-6, atol=1e-6
    )

    # grads flow through every part and through the sliced kernel
    def loss(p, parts):
        return jnp.sum(sum_m.apply({"params": p}, parts) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(p_sum, parts)

    def loss_cat(p, cat):
        return jnp.sum(dense_m.apply({"params": p}, cat) ** 2)

    gp_c, gx_c = jax.grad(loss_cat, argnums=(0, 1))(p_dense, cat)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        gp, gp_c,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(gx, axis=-1)), np.asarray(gx_c),
        rtol=1e-5, atol=1e-6,
    )

    # bf16 compute: output dtype tracks the knob, values track f32
    out16 = SumDense(11, dtype=jnp.bfloat16).apply({"params": p_sum}, parts)
    assert out16.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(out16.astype(jnp.float32) - out_cat)))
    assert err / (float(jnp.max(jnp.abs(out_cat))) + 1e-6) < 0.05


@pytest.mark.parametrize("name", ["GCN", "AdaLanczosNet"])
def test_sparse_runner_stores_features_in_compute_dtype(tmp_path, name):
    """Under `model.dtype: bfloat16` the runner stores features in the
    compute dtype (the model's first op is the cast anyway — an f32
    copy is 640 MB of dead HBM at 10M nodes, the r4 runtime-OOM
    margin); AdaLanczosNet's kernel embedding must still run its f32
    spectral-core contract, and training must stay finite+learning."""
    import pathlib

    kw = (
        {"num_eig_vec": 6, "kernel_dim": 8, "short_diffusion_dist": [1],
         "long_diffusion_dist": [3]}
        if name == "AdaLanczosNet"
        else {}
    )
    cfg = AttrDict.convert(
        {
            "exp_name": f"bf16_store_{name}",
            "runner": "SparseCitationRunner",
            "seed": 0,
            "save_dir": str(tmp_path / name),
            "dataset": {"source": "synthetic", "name": "cora", "scale": 0.08},
            "model": {
                "name": name, "hidden_dim": [32], "dtype": "bfloat16", **kw,
            },
            "train": {"optimizer": "Adam", "lr": 1e-2, "max_epoch": 30,
                      "patience": 40, "display_iter": 20},
            "test": {},
        }
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    assert runner.x.dtype == jnp.bfloat16
    res = runner.train()
    assert res["best_val_acc"] > 1.0 / 7 + 0.05


def test_sparse_runner_resume(tmp_path):
    """`train.is_resume` restarts from the periodic `latest` snapshot
    with the best-so-far carried over (parity with the QM8 runner's
    resume policy, reference `snapshot()`/`load_model`)."""
    import pathlib

    def cfg_for(max_epoch):
        return AttrDict.convert(
            {
                "exp_name": "sp_resume",
                "runner": "SparseCitationRunner",
                "seed": 0,
                "save_dir": str(tmp_path / "run"),
                "dataset": {
                    "source": "synthetic", "name": "cora", "scale": 0.08,
                },
                "model": {"name": "GCN", "hidden_dim": [32], "dropout": 0.0},
                "train": {
                    "optimizer": "Adam", "lr": 1e-2,
                    "max_epoch": max_epoch, "patience": 1000,
                    "display_iter": 50, "snapshot_epoch": 5,
                    "is_resume": True,
                },
                "test": {},
            }
        )

    pathlib.Path(tmp_path / "run").mkdir(parents=True, exist_ok=True)
    first = build_runner(cfg_for(10)).train()
    # resume continues from the epoch-10 latest snapshot, not epoch 0
    runner = build_runner(cfg_for(20))
    assert runner.ckpt.exists("latest")
    second = runner.train()
    meta = runner.ckpt.meta("latest") or {}
    assert int(meta.get("epoch", -1)) >= 10
    assert second["best_val_acc"] >= first["best_val_acc"] - 1e-6


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


def test_synthetic_edges_small_graphs_get_test_split():
    """Fixed 500/1000 cutoffs left graphs under ~560 nodes with an
    EMPTY test split (silently reported 0.0 accuracy); splits now scale
    down while keeping the Planetoid 500/1000 at dataset scale."""
    from lanczosnet_tpu.data.citation import synthetic_citation_edges

    small = synthetic_citation_edges(200, num_class=3, feat_dim=8, seed=7)
    assert small["test_mask"].sum() > 0
    assert small["val_mask"].sum() > 0
    assert not (small["val_mask"] & small["test_mask"]).any()
    big = synthetic_citation_edges(5000, num_class=5, feat_dim=16, seed=7)
    assert big["val_mask"].sum() == 500
    assert big["test_mask"].sum() == 1000


def test_edge_gather_custom_vjp_matches_plain_autodiff():
    """`edge_gather`'s custom transpose (col_perm-sorted, f32-accumulated
    scatter) must be the SAME linear map as plain autodiff's unsorted
    scatter-add — checked through spmv, the learned-kernel operator
    (per-edge Gaussian on embeddings), and mean_spmv, against an op
    stripped of its col_perm (which also exercises the fallback)."""
    import jax

    from lanczosnet_tpu.ops.sparse import learned_kernel_op, mean_spmv

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 50, (200, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    op = sparse_sym_operator(edges, 50)
    assert op.col_perm is not None
    op_plain = op.replace(col_perm=None)
    x = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)

    for f in (
        lambda o: lambda x: (spmv(o, x) ** 2).sum(),
        lambda o: lambda x: (mean_spmv(o, x) ** 2).sum(),
    ):
        g_sorted = jax.jit(jax.grad(f(op)))(x)
        g_plain = jax.jit(jax.grad(f(op_plain)))(x)
        np.testing.assert_allclose(
            np.asarray(g_sorted), np.asarray(g_plain), rtol=1e-6, atol=1e-7
        )

    k = lambda o: lambda e: (spmv(learned_kernel_op(o, e), x) ** 2).sum()
    np.testing.assert_allclose(
        np.asarray(jax.grad(k(op))(emb)),
        np.asarray(jax.grad(k(op_plain))(emb)),
        rtol=1e-5, atol=1e-6,
    )

    # bf16 cotangents accumulate in f32 and come back bf16 and finite
    xb = x.astype(jnp.bfloat16)
    gb = jax.grad(
        lambda x: (spmv(op, x).astype(jnp.float32) ** 2).sum()
    )(xb)
    assert gb.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gb.astype(jnp.float32)).all())
