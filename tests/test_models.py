"""All nine models: shape contract, padding/permutation invariance,
finite gradients (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczosnet_tpu.models import MODEL_REGISTRY, build_model, mae_loss

from helpers import NUM_TASK, make_batch, random_graphs

BASE_CFG = {
    "num_atom": 8,
    "hidden_dim": [16, 16],
    "num_task": NUM_TASK,
    "output_hidden_dim": [8],
    "dropout": 0.1,
    # model-specific knobs (ignored by models that don't use them)
    "poly_order": 3,
    "max_hop": 2,
    "num_heads": 2,
    "num_prop": 2,
    "num_eig_vec": 6,
    "short_diffusion_dist": [1, 2],
    "long_diffusion_dist": [3, 5],
    "spectral_filter_kind": "MLP",
    "kernel_dim": 8,
}

ALL_MODELS = sorted(MODEL_REGISTRY)


def _batch_for(name, rng, **kw):
    return make_batch(
        rng,
        with_ritz=(name == "LanczosNet"),
        k=BASE_CFG["num_eig_vec"],
        with_cluster=(name == "GPNN"),
        **kw,
    )


def _init_and_apply(name, batch, deterministic=True, seed=0):
    model = build_model({**BASE_CFG, "name": name})
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, batch, deterministic=True
    )
    pred = model.apply(
        variables,
        batch,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": jax.random.PRNGKey(1)},
    )
    return model, variables, pred


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_shape_and_finite(name):
    rng = np.random.default_rng(0)
    batch = _batch_for(name, rng)
    _, _, pred = _init_and_apply(name, batch)
    assert pred.shape == (4, NUM_TASK)
    assert np.isfinite(np.asarray(pred)).all()
    assert np.isfinite(float(mae_loss(pred, batch.label)))


@pytest.mark.parametrize("name", ALL_MODELS)
def test_padding_invariance(name):
    """Extra padding must not change predictions (mask correctness)."""
    rng = np.random.default_rng(1)
    graphs = random_graphs(rng, 3)
    b1 = _batch_for(name, rng, graphs=graphs, n_max=12)
    b2 = _batch_for(name, rng, graphs=graphs, n_max=20)
    model = build_model({**BASE_CFG, "name": name})
    variables = model.init({"params": jax.random.PRNGKey(0)}, b1, deterministic=True)
    p1 = np.asarray(model.apply(variables, b1, deterministic=True))
    p2 = np.asarray(model.apply(variables, b2, deterministic=True))
    np.testing.assert_allclose(p1, p2, atol=2e-4)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_gradients_finite(name):
    rng = np.random.default_rng(2)
    batch = _batch_for(name, rng)
    model = build_model({**BASE_CFG, "name": name})
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, deterministic=True)

    def loss_fn(params):
        pred = model.apply({"params": params}, batch, deterministic=True)
        return mae_loss(pred, batch.label)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least one nonzero gradient
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_permutation_invariance_gcn():
    """Node relabeling must not change graph-level predictions."""
    rng = np.random.default_rng(3)
    graphs = random_graphs(rng, 1, n_lo=8, n_hi=8)
    g = graphs[0]
    perm = rng.permutation(8)
    g2 = {
        "atom_type": g["atom_type"][perm],
        "adj": g["adj"][:, perm][:, :, perm],
        "label": g["label"],
    }
    b1 = make_batch(rng, graphs=[g], n_max=10)
    b2 = make_batch(rng, graphs=[g2], n_max=10)
    model = build_model({**BASE_CFG, "name": "GCN"})
    variables = model.init({"params": jax.random.PRNGKey(0)}, b1, deterministic=True)
    p1 = np.asarray(model.apply(variables, b1, deterministic=True))
    p2 = np.asarray(model.apply(variables, b2, deterministic=True))
    np.testing.assert_allclose(p1, p2, atol=1e-4)


def test_dropout_stochastic_and_deterministic():
    rng = np.random.default_rng(4)
    batch = _batch_for("GCN", rng)
    model = build_model({**BASE_CFG, "name": "GCN", "dropout": 0.5})
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, deterministic=True)
    p_det = model.apply(variables, batch, deterministic=True)
    p_a = model.apply(
        variables, batch, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    p_b = model.apply(
        variables, batch, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(p_a), np.asarray(p_b))
    np.testing.assert_allclose(
        np.asarray(p_det),
        np.asarray(model.apply(variables, batch, deterministic=True)),
    )


def test_lanczosnet_requires_ritz():
    rng = np.random.default_rng(5)
    batch = make_batch(rng, with_ritz=False)
    model = build_model({**BASE_CFG, "name": "LanczosNet"})
    with pytest.raises(ValueError, match="Ritz"):
        model.init({"params": jax.random.PRNGKey(0)}, batch, deterministic=True)


def test_registry_rejects_unknown():
    with pytest.raises(KeyError, match="unknown model"):
        build_model({"name": "NotAModel"})


def test_fused_channel_dense_matches_unfused():
    """FusedChannelDense (kernel folded into the channel contraction,
    K = C·N instead of K = N) is the same linear map as nn.Dense on
    [h ‖ flattened stack@h] — identical params, reassociated order."""
    import flax.linen as nn

    from lanczosnet_tpu.models.base import flatten_feature_stack
    from lanczosnet_tpu.models.lanczos_net import FusedChannelDense

    rng = np.random.default_rng(11)
    b, c, n, f, d = 3, 5, 16, 24, 32
    h = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    stack = jnp.asarray(rng.normal(size=(b, c, n, n)), jnp.float32)

    fused = FusedChannelDense(d)
    params = fused.init(jax.random.PRNGKey(0), h, stack)
    out_fused = fused.apply(params, h, stack)

    feats = flatten_feature_stack(jnp.einsum("bcij,bjf->bcif", stack, h))
    z = jnp.concatenate([h, feats], axis=-1)
    out_ref = nn.Dense(d).apply(params, z)  # same kernel/bias tree

    assert out_fused.shape == (b, n, d)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_lanczosnet_sum_dense_matches_concat():
    """`model.sum_dense: true` (layer Dense as SumDense([h, prop]) —
    the batch ≥ 128 layout-flip remedy) is the same model as the
    concat form: identical param tree (same PRNG draws), outputs and
    gradients equal to f32-accumulation tolerance."""
    rng = np.random.default_rng(5)
    batch = _batch_for("LanczosNet", rng)
    m_cat = build_model({**BASE_CFG, "name": "LanczosNet"})
    m_sum = build_model(
        {**BASE_CFG, "name": "LanczosNet", "sum_dense": True}
    )
    v_cat = m_cat.init(
        {"params": jax.random.PRNGKey(3)}, batch, deterministic=True
    )
    v_sum = m_sum.init(
        {"params": jax.random.PRNGKey(3)}, batch, deterministic=True
    )
    jax.tree.map(np.testing.assert_array_equal, v_cat, v_sum)

    out_cat = m_cat.apply(v_cat, batch, deterministic=True)
    out_sum = m_sum.apply(v_cat, batch, deterministic=True)  # swapped tree
    np.testing.assert_allclose(
        np.asarray(out_cat), np.asarray(out_sum), rtol=2e-5, atol=2e-5
    )

    def loss(m, v):
        return mae_loss(m.apply(v, batch, deterministic=True), batch.label)

    g_cat = jax.grad(lambda v: loss(m_cat, v))(v_cat)
    g_sum = jax.grad(lambda v: loss(m_sum, v))(v_cat)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        ),
        g_cat,
        g_sum,
    )


@pytest.mark.parametrize("name", ALL_MODELS)
def test_bf16_activations(name):
    """model.dtype: bfloat16 on every dense model — params stay f32,
    layer activations run bf16, predictions track the f32 model within
    bf16 tolerance, grads are finite f32, and the default (no dtype
    key) stays f32."""
    rng = np.random.default_rng(3)
    batch = _batch_for(name, rng)
    m32 = build_model({**BASE_CFG, "name": name})
    m16 = build_model({**BASE_CFG, "name": name, "dtype": "bfloat16"})
    assert m32.dtype == jnp.float32  # default unchanged
    assert m16.dtype == jnp.bfloat16
    variables = m32.init(
        {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
    )
    # identical param tree (param_dtype f32 in both)
    v16 = m16.init(
        {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
    )
    jax.tree.map(
        lambda a, b: (
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            # params themselves stay f32 under the bf16 knob
            np.testing.assert_equal(b.dtype, jnp.float32),
        ),
        variables["params"], v16["params"],
    )
    p32 = np.asarray(m32.apply(variables, batch, deterministic=True))
    p16 = np.asarray(m16.apply(variables, batch, deterministic=True))
    assert p16.dtype == np.float32  # readout/loss stay f32
    np.testing.assert_allclose(p32, p16, rtol=0.05, atol=0.05)

    def loss_fn(params):
        pred = m16.apply({"params": params}, batch, deterministic=True)
        return mae_loss(pred, batch.label)

    grads = jax.grad(loss_fn)(variables["params"])
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert np.isfinite(np.asarray(g)).all()


def test_ada_lanczosnet_bf16_activations():
    """Same knob on AdaLanczosNet: the learned kernel + in-forward
    Lanczos stay f32 (Ritz pairs identical to the f32 model), only the
    layer loop runs bf16."""
    rng = np.random.default_rng(4)
    batch = _batch_for("AdaLanczosNet", rng)
    m32 = build_model({**BASE_CFG, "name": "AdaLanczosNet"})
    m16 = build_model(
        {**BASE_CFG, "name": "AdaLanczosNet", "dtype": "bf16"}
    )
    variables = m32.init(
        {"params": jax.random.PRNGKey(0)}, batch, deterministic=True
    )
    p32, i32 = m32.apply(
        variables, batch, deterministic=True, mutable=["intermediates"]
    )
    p16, i16 = m16.apply(
        variables, batch, deterministic=True, mutable=["intermediates"]
    )
    # spectral core unaffected by the activation dtype
    np.testing.assert_array_equal(
        np.asarray(i32["intermediates"]["ritz_val"][0]),
        np.asarray(i16["intermediates"]["ritz_val"][0]),
    )
    np.testing.assert_allclose(
        np.asarray(p32), np.asarray(p16), rtol=0.05, atol=0.05
    )


def test_model_dtype_rejects_unknown():
    with pytest.raises(ValueError, match="model.dtype"):
        build_model(
            {**BASE_CFG, "name": "LanczosNet", "dtype": "float16"}
        )
