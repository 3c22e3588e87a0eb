"""`train.remat` — rematerialized sparse backward (r4).

`jax.checkpoint` around the forward recomputes the [E, F] edge-gather
chain in the backward pass instead of saving it — the knob that breaks
the wide-F activation memory wall (PARITY.md r4: F=512 at 1M nodes
OOMs on one v5e from the saved gather activations alone). The
contract: gradients are identical to the unrematerialized step (the
backward replays the same HLO ops), under both policies ("full" saves
nothing, "dots" keeps matmul outputs) and composed with the
node-sharded mesh modes.
"""

import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from lanczosnet_tpu.data.citation import synthetic_citation_edges
from lanczosnet_tpu.models.sparse_nodes import SparseGCN, SparseLanczosNet
from lanczosnet_tpu.ops.sparse import sparse_lanczos_ritz, sparse_sym_operator
from lanczosnet_tpu.parallel.mesh import make_mesh, node_shard_sparse_op, shard_node_array
from lanczosnet_tpu.train.sparse_citation_runner import (
    SparseCitationRunner,
    sharded_sparse_apply,
)
from lanczosnet_tpu.utils.config import AttrDict

POLICIES = {
    "full": None,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def small_graph(n=60, seed=0, feat_dim=8, num_class=3):
    g = synthetic_citation_edges(
        n, num_class=num_class, feat_dim=feat_dim, avg_degree=4.0, seed=seed
    )
    op = sparse_sym_operator(g["edges"], n)
    return op, jnp.asarray(g["features"]), jnp.asarray(
        g["labels"].astype(np.int32)
    )


def _loss_of(model, extras=()):
    def loss(p, x, op):
        logits = model.apply({"params": p}, x, op, *extras)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32),
                jnp.zeros((logits.shape[0],), jnp.int32),
            )
        )

    return loss


@pytest.mark.parametrize("policy_name", sorted(POLICIES))
def test_remat_grads_identical_gcn(policy_name):
    op, x, _ = small_graph()
    model = SparseGCN(hidden_dim=(16, 16), num_class=3, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), x, op)["params"]
    loss = _loss_of(model)
    l0, g0 = jax.value_and_grad(loss)(params, x, op)
    l1, g1 = jax.value_and_grad(
        jax.checkpoint(loss, policy=POLICIES[policy_name])
    )(params, x, op)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g0, g1,
    )


@pytest.mark.parametrize("policy_name", sorted(POLICIES))
def test_remat_grads_identical_lanczos_net(policy_name):
    op, x, _ = small_graph()
    ritz_val, ritz_vec = sparse_lanczos_ritz(op, 8)
    model = SparseLanczosNet(
        hidden_dim=(16,), num_class=3, dropout=0.0,
        short_diffusion_dist=(1, 2), long_diffusion_dist=(3,),
    )
    params = model.init(
        jax.random.PRNGKey(0), x, op, ritz_val, ritz_vec
    )["params"]
    loss = _loss_of(model, extras=(ritz_val, ritz_vec))
    l0, g0 = jax.value_and_grad(loss)(params, x, op)
    l1, g1 = jax.value_and_grad(
        jax.checkpoint(loss, policy=POLICIES[policy_name])
    )(params, x, op)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g0, g1,
    )


def test_remat_composes_with_node_sharding():
    """checkpoint(shard_map(...)) — the backward replays the ring of
    all_gathers; grads must still match the unsharded step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)
    op, x, y = small_graph(n=64)
    model = SparseGCN(hidden_dim=(16,), num_class=3, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), x, op)["params"]
    sop, n_pad = node_shard_sparse_op(op, mesh)
    xs = shard_node_array(x, mesh, n_pad)
    ys = shard_node_array(y, mesh, n_pad)
    live = shard_node_array(jnp.ones((x.shape[0],), jnp.float32), mesh, n_pad)

    def loss_single(p):
        logits = model.apply({"params": p}, x, op)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y)
        )

    def loss_sharded(p, xs, sop, ys, live):
        logits = sharded_sparse_apply(mesh, model, p, xs, sop)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
        return jnp.sum(ce * live) / jnp.sum(live)

    l0, g0 = jax.value_and_grad(loss_single)(params)
    l1, g1 = jax.jit(jax.value_and_grad(jax.checkpoint(loss_sharded)))(
        params, xs, sop, ys, live
    )
    assert np.isclose(float(l0), float(l1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        g0, g1,
    )


def _runner_cfg(d, remat):
    train = {
        "max_epoch": 4, "patience": 10, "lr": 1e-2, "optimizer": "Adam",
        "display_iter": 2,
    }
    if remat is not None:
        train["remat"] = remat
    return AttrDict(
        {
            "seed": 0,
            "save_dir": d,
            "dataset": {
                "source": "synthetic_edges", "num_nodes": 80,
                "num_class": 3, "feat_dim": 8, "avg_degree": 4.0,
            },
            "model": {"name": "GCN", "hidden_dim": [16], "dropout": 0.1},
            "train": train,
        }
    )


@pytest.mark.parametrize("mode", ["full", "layers"])
def test_runner_remat_matches_plain(mode):
    """`train.remat: full|layers` end to end — same seed, same metrics
    (`layers` = nn.remat around each layer method: the backward replays
    one layer at a time, the structure that fits 10M nodes in HBM;
    dropout keys must replay identically inside the lifted remat)."""
    with tempfile.TemporaryDirectory() as d:
        plain = SparseCitationRunner(_runner_cfg(d, None)).train()
    with tempfile.TemporaryDirectory() as d:
        remat = SparseCitationRunner(_runner_cfg(d, mode)).train()
    assert np.isclose(plain["test_acc"], remat["test_acc"], atol=1e-6)
    assert np.isclose(plain["best_val_acc"], remat["best_val_acc"], atol=1e-6)


def test_layer_remat_grads_identical_lanczos_net():
    """remat_layers=True — same params tree, same grads as the plain
    module (nn.remat must not change param paths or dropout streams)."""
    op, x, _ = small_graph()
    ritz_val, ritz_vec = sparse_lanczos_ritz(op, 8)
    kw = dict(
        hidden_dim=(16, 12), num_class=3, dropout=0.0,
        short_diffusion_dist=(1, 2), long_diffusion_dist=(3,),
    )
    plain = SparseLanczosNet(**kw)
    remat = SparseLanczosNet(**kw, remat_layers=True)
    params = plain.init(jax.random.PRNGKey(0), x, op, ritz_val, ritz_vec)[
        "params"
    ]
    p2 = remat.init(jax.random.PRNGKey(0), x, op, ritz_val, ritz_vec)[
        "params"
    ]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params, p2,
    )
    l0, g0 = jax.value_and_grad(_loss_of(plain, extras=(ritz_val, ritz_vec)))(
        params, x, op
    )
    l1, g1 = jax.value_and_grad(_loss_of(remat, extras=(ritz_val, ritz_vec)))(
        params, x, op
    )
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g0, g1,
    )


def test_runner_ring_remat_bf16_lanczos_net():
    """The flagship multi-chip composition (the exact knob set of
    configs/ten_million_sparse_lanczos_net_ring.yaml at small scale):
    LanczosNet × nodes_ring × bfloat16 × remat:layers. The sharded
    Ritz precompute, the per-layer nn.remat replay of ring collectives
    in the backward, and bf16 feature storage must compose — finite and
    learning on the 8-device CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    with tempfile.TemporaryDirectory() as d:
        cfg = _runner_cfg(d, "layers")
        cfg["dataset"]["num_nodes"] = 96
        cfg["model"] = {
            "name": "LanczosNet", "hidden_dim": [16], "dropout": 0.1,
            "num_eig_vec": 6, "short_diffusion_dist": [1, 2],
            "long_diffusion_dist": [3], "dtype": "bfloat16",
        }
        cfg["train"]["num_devices"] = 8
        cfg["train"]["shard"] = "nodes_ring"
        cfg["train"]["max_epoch"] = 30
        res = SparseCitationRunner(cfg).train()
    assert np.isfinite(res["best_val_acc"])
    assert res["best_val_acc"] > 1.0 / 3 + 0.1


def test_runner_rejects_layers_remat_without_support():
    with tempfile.TemporaryDirectory() as d:
        cfg = _runner_cfg(d, "layers")
        cfg["model"]["name"] = "MPNN"
        with pytest.raises(ValueError, match="per-layer remat"):
            SparseCitationRunner(cfg)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_chunked_backward_scatter_matches_plain(monkeypatch, dtype):
    """Force `edge_gather`'s chunked cotangent scatter (the >2 GiB
    transient bound that lets the 10M-node step fit HBM) and check it
    is grad-identical to the unchunked sorted scatter and to plain
    autodiff (col_perm=None fallback)."""
    import lanczosnet_tpu.ops.sparse as sp

    op, x, _ = small_graph(n=50)
    dt = jnp.dtype(dtype)
    w = jnp.linspace(0.5, 1.5, x.shape[1]).astype(dt)

    def loss(xx, the_op):
        msg = sp.edge_gather(the_op, xx.astype(dt)) * w
        out = jax.ops.segment_sum(
            msg.astype(jnp.float32), the_op.row, num_segments=the_op.n
        )
        return jnp.sum(jnp.tanh(out))

    g_ref = jax.grad(loss)(x, op.replace(col_perm=None))
    g_sorted = jax.grad(loss)(x, op)
    monkeypatch.setattr(sp, "_BWD_CHUNK_ENGAGE", 64)
    monkeypatch.setattr(sp, "_BWD_CHUNK_TARGET", 128)
    g_chunked = jax.grad(loss)(x, op)
    tol = dict(rtol=1e-6, atol=1e-7) if dtype == "float32" else dict(
        rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_chunked), np.asarray(g_sorted), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g_chunked), np.asarray(g_ref), **tol
    )


def test_runner_rejects_unknown_remat():
    with tempfile.TemporaryDirectory() as d:
        runner = SparseCitationRunner(_runner_cfg(d, "bogus"))
        with pytest.raises(ValueError, match="train.remat"):
            runner.train()
