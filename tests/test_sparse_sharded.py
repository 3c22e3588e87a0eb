"""Edge-sharded sparse path (VERDICT round-1 #5).

Runs on the conftest-forced 8-device CPU mesh. The contract: with the
operator edge-sharded over the mesh and the forward inside a shard_map,
losses, logits and GRADIENTS are identical to the single-device sparse
path (up to f32 reduction order), for every sparse model — and a
million-node synthetic graph trains.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from lanczosnet_tpu.data.citation import synthetic_citation_edges
from lanczosnet_tpu.models.sparse_nodes import (
    SparseChebyNet,
    SparseGAT,
    SparseGCN,
    SparseLanczosNet,
)
from lanczosnet_tpu.ops.poly import chebyshev_features
from lanczosnet_tpu.ops.sparse import (
    sparse_lanczos_ritz,
    sparse_sym_operator,
    spmv,
)
from lanczosnet_tpu.parallel.mesh import make_mesh, shard_sparse_op
from lanczosnet_tpu.train.sparse_citation_runner import sharded_sparse_apply


def small_graph(n=60, seed=0, feat_dim=8, num_class=3):
    g = synthetic_citation_edges(
        n, num_class=num_class, feat_dim=feat_dim, avg_degree=4.0, seed=seed
    )
    op = sparse_sym_operator(g["edges"], n)
    x = jnp.asarray(g["features"])
    y = jnp.asarray(g["labels"].astype(np.int32))
    return op, x, y


def require_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(8)


MODELS = {
    "gcn": lambda c: SparseGCN(hidden_dim=(16,), num_class=c, dropout=0.0),
    "chebynet": lambda c: SparseChebyNet(
        hidden_dim=(16,), num_class=c, poly_order=3, dropout=0.0
    ),
    "gat": lambda c: SparseGAT(
        hidden_dim=(16,), num_class=c, num_head=2, dropout=0.0
    ),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_sharded_forward_and_grads_match_single_device(name):
    mesh = require_mesh()
    op, x, y = small_graph()
    model = MODELS[name](3)
    params = model.init(jax.random.PRNGKey(0), x, op)["params"]
    sop = shard_sparse_op(op, mesh)

    def loss_single(p):
        logits = model.apply({"params": p}, x, op)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y)
        )

    def loss_sharded(p):
        logits = sharded_sparse_apply(mesh, model, p, x, sop)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y)
        )

    l0, g0 = jax.value_and_grad(loss_single)(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sharded))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_sharded_lanczosnet_with_sharded_ritz():
    mesh = require_mesh()
    op, x, y = small_graph(seed=3)
    k = 6
    ritz_single = sparse_lanczos_ritz(op, k)
    sop = shard_sparse_op(op, mesh)
    from jax.sharding import PartitionSpec as P

    op_specs = sop.shard_specs("data")
    ritz_sharded = jax.jit(jax.shard_map(
        lambda lop: sparse_lanczos_ritz(lop, k),
        mesh=mesh, in_specs=(op_specs,), out_specs=(P(), P()),
    ))(sop)
    np.testing.assert_allclose(
        np.asarray(ritz_single[0]), np.asarray(ritz_sharded[0]), atol=1e-4
    )
    model = SparseLanczosNet(hidden_dim=(16,), num_class=3, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), x, op, *ritz_single)["params"]
    out0 = model.apply({"params": params}, x, op, *ritz_single)
    out1 = jax.jit(
        lambda p: sharded_sparse_apply(
            mesh, model, p, x, sop, extras=ritz_sharded
        )
    )(params)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), rtol=1e-4, atol=1e-4
    )


def test_sparse_chebynet_matches_dense_features():
    """The sparse Chebyshev recurrence equals the dense one on the same
    operator (semantic lockstep with ops/poly.py)."""
    op, x, _ = small_graph(n=40, seed=5)
    dense = np.zeros((op.n, op.n), np.float32)
    dense[np.asarray(op.row), np.asarray(op.col)] = np.asarray(op.val)
    feats_dense = chebyshev_features(
        jnp.asarray(dense[None]), x[None], order=3
    )[0]  # [4, N, F]
    t0, t1 = x, spmv(op, x)
    feats_sparse = [t0, t1]
    for _ in range(2):
        feats_sparse.append(2.0 * spmv(op, feats_sparse[-1]) - feats_sparse[-2])
    for d, s in zip(feats_dense, feats_sparse):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s), atol=1e-4)


def test_gat_attention_is_normalized_distribution():
    """Per-node attention (incl. the implicit self edge) sums to 1."""
    from lanczosnet_tpu.ops.sparse import segment_softmax_coo

    op, x, _ = small_graph(n=30, seed=6)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((op.row.shape[0], 2)), jnp.float32)
    self_logits = jnp.asarray(rng.standard_normal((op.n, 2)), jnp.float32)
    p, denom, p_self = segment_softmax_coo(logits, op, self_logits)
    total = jax.ops.segment_sum(p, op.row, num_segments=op.n) + p_self
    np.testing.assert_allclose(np.asarray(total / denom), 1.0, atol=1e-5)


def test_million_node_sharded_training_step():
    """>=1M-node synthetic graph: one sharded train step on the 8-device
    mesh, loss finite and decreasing over a few steps."""
    mesh = require_mesh()
    n = 1_000_000
    g = synthetic_citation_edges(
        n, num_class=5, feat_dim=16, avg_degree=3.0, seed=1
    )
    op = shard_sparse_op(sparse_sym_operator(g["edges"], n), mesh)
    x = jnp.asarray(g["features"])
    y = jnp.asarray(g["labels"].astype(np.int32))
    model = SparseGCN(hidden_dim=(16,), num_class=5, dropout=0.0)
    init_op = sparse_sym_operator(g["edges"][:64], n)
    params = model.init(jax.random.PRNGKey(0), x, init_op)["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = sharded_sparse_apply(mesh, model, p, x, op)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
