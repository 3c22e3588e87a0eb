"""Node-sharded sparse path — the memory-scaling mode (ROADMAP.md #2
"remaining": shard the replicated [N, F] activations).

Runs on the conftest-forced 8-device CPU mesh. The contract: with nodes
split into contiguous blocks (destination-bucketed edges,
`parallel/mesh.py:node_shard_sparse_op`) and the forward inside a
shard_map, logits and GRADIENTS are identical to the single-device
sparse path on the zero-padded graph — for every sparse model family,
including the in-forward Lanczos ones (whose recursion runs the exact
global iteration via psum'd inner products).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from lanczosnet_tpu.data.citation import synthetic_citation_edges
from lanczosnet_tpu.data.partition import sparse_spectral_partition
from lanczosnet_tpu.models.sparse_nodes import (
    SparseAdaLanczosNet,
    SparseChebyNet,
    SparseDCNN,
    SparseGAT,
    SparseGCN,
    SparseGPNN,
    SparseGraphSAGE,
    SparseLanczosNet,
    SparseMPNN,
)
from lanczosnet_tpu.ops.sparse import (
    sparse_lanczos_ritz,
    sparse_row_stochastic_operator,
    sparse_sym_operator,
)
from lanczosnet_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    node_shard_sparse_op,
    shard_node_array,
)
from lanczosnet_tpu.train.sparse_citation_runner import sharded_sparse_apply

N = 60
NUM_CLASS = 3


def small_graph(n=N, seed=0, feat_dim=8, num_class=NUM_CLASS):
    g = synthetic_citation_edges(
        n, num_class=num_class, feat_dim=feat_dim, avg_degree=4.0, seed=seed
    )
    return g


def require_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(8)


def _pad(x, n_pad):
    pad = n_pad - x.shape[0]
    return jnp.concatenate(
        [jnp.asarray(x), jnp.zeros((pad,) + x.shape[1:], jnp.asarray(x).dtype)]
    )


MODELS = {
    "gcn": lambda c: SparseGCN(hidden_dim=(16,), num_class=c, dropout=0.0),
    "chebynet": lambda c: SparseChebyNet(
        hidden_dim=(16,), num_class=c, poly_order=3, dropout=0.0
    ),
    "gat": lambda c: SparseGAT(
        hidden_dim=(16,), num_class=c, num_head=2, dropout=0.0
    ),
    "dcnn": lambda c: SparseDCNN(
        hidden_dim=(16,), num_class=c, max_hop=2, dropout=0.0
    ),
    "graphsage": lambda c: SparseGraphSAGE(
        hidden_dim=(16,), num_class=c, dropout=0.0
    ),
    "mpnn": lambda c: SparseMPNN(
        hidden_dim=(16,), num_class=c, num_prop=2, dropout=0.0
    ),
    "ada_lanczosnet": lambda c: SparseAdaLanczosNet(
        hidden_dim=(16,), num_class=c, num_eig_vec=8,
        short_diffusion_dist=(1, 2), long_diffusion_dist=(3,), dropout=0.0
    ),
}


def _setup(name, mesh):
    """Build (model, unsharded padded args, sharded args + specs)."""
    g = small_graph()
    n = g["features"].shape[0]
    kind = (
        sparse_row_stochastic_operator if name == "dcnn"
        else sparse_sym_operator
    )
    op = kind(g["edges"], n)
    sop, n_pad = node_shard_sparse_op(op, mesh)
    # unsharded reference on the zero-padded graph: pad nodes are
    # isolated, so real-node logits are untouched; n_true keeps the
    # Lanczos start vector off the pad rows exactly like the sharded op
    ref_op = kind(g["edges"], n_pad).replace(n_true=n)
    x = _pad(g["features"], n_pad)
    xs = shard_node_array(g["features"], mesh, n_pad)
    return op, ref_op, sop, n_pad, x, xs, g


@pytest.mark.parametrize("name", sorted(MODELS))
def test_node_sharded_forward_and_grads_match_single_device(name):
    mesh = require_mesh()
    op, ref_op, sop, n_pad, x, xs, g = _setup(name, mesh)
    model = MODELS[name](NUM_CLASS)
    params = model.init(jax.random.PRNGKey(0), x, ref_op)["params"]
    y = _pad(jnp.asarray(g["labels"].astype(np.int32)), n_pad)
    m = _pad(jnp.ones((N,), jnp.float32), n_pad)
    ys = shard_node_array(g["labels"].astype(np.int32), mesh, n_pad)
    ms = shard_node_array(np.ones((N,), np.float32), mesh, n_pad)

    def masked_ce(logits, y, m):
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.sum(ce * m) / jnp.sum(m)

    def loss_single(p):
        return masked_ce(model.apply({"params": p}, x, ref_op), y, m)

    def loss_sharded(p):
        logits = sharded_sparse_apply(mesh, model, p, xs, sop)
        return masked_ce(logits, ys, ms)

    l0, g0 = jax.jit(jax.value_and_grad(loss_single))(params)
    vg_sharded = jax.jit(jax.value_and_grad(loss_sharded))
    l1, g1 = vg_sharded(params)
    if not np.isfinite(float(l1)):
        # Forensics for the order-dependent flake (VERDICT r2 weak #1):
        # it reproduces only inside a full-suite process (~40% of runs),
        # so on the rare hit, distinguish a nondeterministic-execution
        # race (retry of the SAME executable differs) from a poisoned
        # trace/compile (fresh retrace still NaN), and localize which
        # node blocks went non-finite.
        l1_retry, _ = vg_sharded(params)
        vg_fresh = jax.jit(
            jax.value_and_grad(lambda p: loss_sharded(p))
        )
        l1_fresh, _ = vg_fresh(params)
        logits = jax.jit(
            lambda p: sharded_sparse_apply(mesh, model, p, xs, sop)
        )(params)
        arr = np.asarray(logits)
        bad_rows = np.where(~np.isfinite(arr).all(axis=-1))[0]
        n_loc = arr.shape[0] // 8
        pytest.fail(
            f"sharded loss non-finite: first={float(l1)!r}, "
            f"retry_same_executable={float(l1_retry)!r}, "
            f"fresh_trace={float(l1_fresh)!r}, "
            f"single_device={float(l0)!r}, "
            f"non-finite logit rows {bad_rows[:64].tolist()} "
            f"(device blocks {sorted(set((bad_rows // max(n_loc, 1)).tolist()))})"
        )
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5, atol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        g0, g1,
    )


def test_node_sharded_lanczos_ritz_matches_unsharded():
    mesh = require_mesh()
    g = small_graph()
    n = g["features"].shape[0]
    op = sparse_sym_operator(g["edges"], n)
    sop, n_pad = node_shard_sparse_op(op, mesh)
    op_specs = sop.shard_specs(DATA_AXIS)
    k = 8
    rv, rvec = jax.jit(jax.shard_map(
        lambda lop: sparse_lanczos_ritz(lop, k),
        mesh=mesh, in_specs=(op_specs,), out_specs=(P(), P(DATA_AXIS)),
    ))(sop)
    rv0, rvec0 = sparse_lanczos_ritz(
        sparse_sym_operator(g["edges"], n_pad).replace(n_true=n), k
    )
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rvec), np.asarray(rvec0), atol=1e-4)
    # device-count invariance (the point of n_true): the sharded Ritz
    # pairs equal the UNPADDED single-device ones on the real rows
    rv_t, rvec_t = sparse_lanczos_ritz(op, k)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv_t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rvec)[:n], np.asarray(rvec_t), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(rvec)[n:], 0.0, atol=1e-6)


def test_node_sharded_lanczosnet_with_sharded_ritz():
    mesh = require_mesh()
    op, ref_op, sop, n_pad, x, xs, g = _setup("gcn", mesh)
    model = SparseLanczosNet(
        hidden_dim=(16,), num_class=NUM_CLASS,
        short_diffusion_dist=(1,), long_diffusion_dist=(3,), dropout=0.0,
    )
    k = 8
    rv0, rvec0 = sparse_lanczos_ritz(ref_op, k)
    params = model.init(jax.random.PRNGKey(0), x, ref_op, rv0, rvec0)["params"]

    op_specs = sop.shard_specs(DATA_AXIS)
    rv, rvec = jax.jit(jax.shard_map(
        lambda lop: sparse_lanczos_ritz(lop, k),
        mesh=mesh, in_specs=(op_specs,), out_specs=(P(), P(DATA_AXIS)),
    ))(sop)

    ref = model.apply({"params": params}, x, ref_op, rv0, rvec0)
    out = sharded_sparse_apply(
        mesh, model, params, xs, sop,
        extras=(rv, rvec), extra_specs=(P(), P(DATA_AXIS)),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_node_sharded_gpnn_with_sharded_partition():
    mesh = require_mesh()
    op, ref_op, sop, n_pad, x, xs, g = _setup("gcn", mesh)
    part = sparse_spectral_partition(op, 2)
    part_pad = _pad(jnp.asarray(part, jnp.int32), n_pad)
    parts = shard_node_array(np.asarray(part, np.int32), mesh, n_pad)
    model = SparseGPNN(
        hidden_dim=(16,), num_class=NUM_CLASS,
        num_prop=1, num_intra_prop=1, num_cut_prop=1, dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0), x, ref_op, part_pad)["params"]
    ref = model.apply({"params": params}, x, ref_op, part_pad)
    out = sharded_sparse_apply(
        mesh, model, params, xs, sop,
        extras=(parts,), extra_specs=(P(DATA_AXIS),),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_node_sharded_runner_end_to_end():
    from lanczosnet_tpu.train.sparse_citation_runner import (
        SparseCitationRunner,
    )
    from lanczosnet_tpu.utils.config import AttrDict

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    import tempfile

    for model_cfg in (
        {"name": "GCN", "hidden_dim": [16], "dropout": 0.1},
        {
            "name": "LanczosNet", "hidden_dim": [16], "dropout": 0.0,
            "num_eig_vec": 8, "short_diffusion_dist": [1],
            "long_diffusion_dist": [3],
        },
    ):
        with tempfile.TemporaryDirectory() as d:
            cfg = AttrDict(
                {
                    "seed": 0,
                    "save_dir": d,
                    "dataset": {
                        "source": "synthetic_edges", "num_nodes": 100,
                        "num_class": 3, "feat_dim": 8, "avg_degree": 4.0,
                    },
                    "model": model_cfg,
                    "train": {
                        "num_devices": 8, "shard": "nodes", "max_epoch": 5,
                        "patience": 10, "lr": 1e-2, "optimizer": "Adam",
                        "display_iter": 2,
                    },
                }
            )
            res = SparseCitationRunner(cfg).train()
            assert np.isfinite(res["best_val_acc"])
            assert 0.0 <= res["test_acc"] <= 1.0


def test_node_sharded_state_is_actually_sharded():
    """The point of the mode: persistent node arrays live as 1/8 blocks."""
    mesh = require_mesh()
    g = small_graph(n=64)
    op = sparse_sym_operator(g["edges"], 64)
    sop, n_pad = node_shard_sparse_op(op, mesh)
    xs = shard_node_array(g["features"], mesh, n_pad)
    assert n_pad == 64
    # one shard per device, each holding n_pad/8 rows
    shards = xs.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[0] == n_pad // 8 for s in shards)
    assert sop.row.addressable_shards[0].data.shape[0] * 8 == sop.row.shape[0]


# all nine families ride the ring: spmv ones directly, GAT via the
# online-softmax ring, AdaLanczosNet via per-(dst,src)-slice kernel
# evaluation (VERDICT r2 item 2 — the carve-out is gone)
RING_MODELS = MODELS


@pytest.mark.parametrize("name", sorted(RING_MODELS))
def test_ring_forward_and_grads_match_single_device(name):
    """Ring-pipelined node sharding (ppermute source blocks, no
    all_gather) must equal the unsharded forward/grads exactly like the
    gather mode does."""
    from lanczosnet_tpu.parallel.mesh import ring_shard_sparse_op

    mesh = require_mesh()
    g = small_graph()
    n = g["features"].shape[0]
    kind = (
        sparse_row_stochastic_operator if name == "dcnn"
        else sparse_sym_operator
    )
    op = kind(g["edges"], n)
    rop, n_pad = ring_shard_sparse_op(op, mesh)
    ref_op = kind(g["edges"], n_pad).replace(n_true=n)
    x = _pad(g["features"], n_pad)
    xs = shard_node_array(g["features"], mesh, n_pad)
    model = RING_MODELS[name](NUM_CLASS)
    params = model.init(jax.random.PRNGKey(0), x, ref_op)["params"]
    y = _pad(jnp.asarray(g["labels"].astype(np.int32)), n_pad)
    m = _pad(jnp.ones((N,), jnp.float32), n_pad)
    ys = shard_node_array(g["labels"].astype(np.int32), mesh, n_pad)
    ms = shard_node_array(np.ones((N,), np.float32), mesh, n_pad)

    def masked_ce(logits, y, m):
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.sum(ce * m) / jnp.sum(m)

    def loss_single(p):
        return masked_ce(model.apply({"params": p}, x, ref_op), y, m)

    def loss_ring(p):
        logits = sharded_sparse_apply(mesh, model, p, xs, rop)
        return masked_ce(logits, ys, ms)

    l0, g0 = jax.jit(jax.value_and_grad(loss_single))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_ring))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5, atol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        g0, g1,
    )


def test_ring_lanczos_ritz_matches_unsharded():
    from lanczosnet_tpu.parallel.mesh import ring_shard_sparse_op
    mesh = require_mesh()
    g = small_graph()
    n = g["features"].shape[0]
    op = sparse_sym_operator(g["edges"], n)
    rop, n_pad = ring_shard_sparse_op(op, mesh)
    op_specs = rop.shard_specs(DATA_AXIS)
    k = 8
    rv, rvec = jax.jit(jax.shard_map(
        lambda lop: sparse_lanczos_ritz(lop, k),
        mesh=mesh, in_specs=(op_specs,), out_specs=(P(), P(DATA_AXIS)),
    ))(rop)
    rv0, rvec0 = sparse_lanczos_ritz(
        sparse_sym_operator(g["edges"], n_pad).replace(n_true=n), k
    )
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rvec), np.asarray(rvec0), atol=1e-4)


def test_ring_runner_end_to_end_and_rejects_unsupported():
    from lanczosnet_tpu.train.sparse_citation_runner import (
        SparseCitationRunner,
    )
    from lanczosnet_tpu.utils.config import AttrDict

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    import tempfile

    def cfg_for(model_cfg):
        return AttrDict(
            {
                "seed": 0,
                "save_dir": tempfile.mkdtemp(),
                "dataset": {
                    "source": "synthetic_edges", "num_nodes": 100,
                    "num_class": 3, "feat_dim": 8, "avg_degree": 4.0,
                },
                "model": model_cfg,
                "train": {
                    "num_devices": 8, "shard": "nodes_ring", "max_epoch": 5,
                    "patience": 10, "lr": 1e-2, "optimizer": "Adam",
                    "display_iter": 2,
                },
            }
        )

    res = SparseCitationRunner(
        cfg_for({"name": "GCN", "hidden_dim": [16], "dropout": 0.1})
    ).train()
    assert np.isfinite(res["best_val_acc"])

    res = SparseCitationRunner(
        cfg_for({
            "name": "LanczosNet", "hidden_dim": [16], "dropout": 0.0,
            "num_eig_vec": 8, "short_diffusion_dist": [1],
            "long_diffusion_dist": [3],
        })
    ).train()
    assert np.isfinite(res["best_val_acc"])

    # the formerly-rejected gather-bound family trains on the ring now
    res = SparseCitationRunner(
        cfg_for({"name": "GAT", "hidden_dim": [16], "num_head": 2,
                 "dropout": 0.1})
    ).train()
    assert np.isfinite(res["best_val_acc"])


def test_ring_gpnn_with_sharded_partition():
    from lanczosnet_tpu.parallel.mesh import ring_shard_sparse_op

    mesh = require_mesh()
    g = small_graph()
    n = g["features"].shape[0]
    op = sparse_sym_operator(g["edges"], n)
    rop, n_pad = ring_shard_sparse_op(op, mesh)
    ref_op = sparse_sym_operator(g["edges"], n_pad).replace(n_true=n)
    x = _pad(g["features"], n_pad)
    xs = shard_node_array(g["features"], mesh, n_pad)
    part = sparse_spectral_partition(op, 2)
    part_pad = _pad(jnp.asarray(part, jnp.int32), n_pad)
    parts = shard_node_array(np.asarray(part, np.int32), mesh, n_pad)
    model = SparseGPNN(
        hidden_dim=(16,), num_class=NUM_CLASS,
        num_prop=1, num_intra_prop=1, num_cut_prop=1, dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0), x, ref_op, part_pad)["params"]
    ref = model.apply({"params": params}, x, ref_op, part_pad)
    out = sharded_sparse_apply(
        mesh, model, params, xs, rop,
        extras=(parts,), extra_specs=(P(DATA_AXIS),),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
