"""GraphBatch contract + operator library tests (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from lanczosnet_tpu.core.graph_batch import GraphBatch, batch_graphs, pad_graph
from lanczosnet_tpu.ops.masked import l2_normalize, masked_mean, masked_softmax
from lanczosnet_tpu.ops.normalize import (
    build_operator_stack,
    row_normalize,
    sym_normalize,
)
from lanczosnet_tpu.ops.poly import (
    chebyshev_features,
    diffusion_features,
    diffusion_features_at,
)
from lanczosnet_tpu.ops.spectral import long_scale_features


def _rand_adj(rng, b, e, n, mask):
    a = (rng.random((b, e, n, n)) < 0.5).astype(np.float32)
    a = np.triu(a, 1)
    a = a + np.swapaxes(a, -1, -2)
    a = a * mask[:, None, :, None] * mask[:, None, None, :]
    return a


def test_pad_graph_and_batch():
    at = np.array([1, 2, 3], np.int32)
    adj = np.ones((2, 3, 3), np.float32)
    a, f, adj_p, m = pad_graph(at, None, adj, 5)
    assert a.shape == (5,) and adj_p.shape == (2, 5, 5) and m.tolist() == [1, 1, 1, 0, 0]
    batch = batch_graphs(
        [{"atom_type": at, "adj": adj, "label": np.zeros(4)}] * 3, n_max=5
    )
    assert batch["adj"].shape == (3, 2, 5, 5)
    assert batch["label"].shape == (3, 4)


def test_sym_normalize_zero_rows_on_padding():
    rng = np.random.default_rng(0)
    mask = np.array([[1, 1, 1, 0]], np.float32)
    a = _rand_adj(rng, 1, 1, 4, mask)[:, 0]
    s = np.asarray(sym_normalize(jnp.asarray(a), jnp.asarray(mask)))
    assert np.abs(s[0, 3]).max() == 0 and np.abs(s[0, :, 3]).max() == 0
    # symmetric-normalized adjacency has spectral radius <= 1
    ev = np.linalg.eigvalsh(s[0])
    assert np.abs(ev).max() <= 1 + 1e-5


def test_row_normalize_stochastic():
    rng = np.random.default_rng(1)
    mask = np.ones((2, 6), np.float32)
    a = _rand_adj(rng, 2, 1, 6, mask)[:, 0] + 0.1
    a = a * (1 - np.eye(6))
    p = np.asarray(row_normalize(jnp.asarray(a), jnp.asarray(mask)))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_operator_stack_shape_and_channel0():
    rng = np.random.default_rng(2)
    mask = np.array([[1, 1, 1, 1, 0]], np.float32)
    adj = _rand_adj(rng, 1, 3, 5, mask)
    ops = np.asarray(build_operator_stack(jnp.asarray(adj), jnp.asarray(mask)))
    assert ops.shape == (1, 4, 5, 5)
    full = np.asarray(sym_normalize(jnp.asarray(adj.sum(1)), jnp.asarray(mask)))
    np.testing.assert_allclose(ops[:, 0], full, atol=1e-6)


def test_masked_softmax_rows():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 1.0, 1.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    p = np.asarray(masked_softmax(logits, mask))
    np.testing.assert_allclose(p[0, 2], 0.0)
    np.testing.assert_allclose(p[0].sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(p[1], 0.0)  # fully-masked row -> zeros, no NaN


def test_masked_mean_and_l2():
    x = jnp.asarray([[[1.0], [3.0], [100.0]]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])[..., None]
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask)), [[2.0]])
    z = np.asarray(l2_normalize(jnp.zeros((2, 3))))
    assert np.isfinite(z).all()


def test_chebyshev_recurrence_matches_numpy():
    rng = np.random.default_rng(3)
    n, f = 6, 3
    s = rng.standard_normal((1, n, n)).astype(np.float32)
    s = 0.5 * (s + np.swapaxes(s, -1, -2)) / n
    x = rng.standard_normal((1, n, f)).astype(np.float32)
    feats = np.asarray(chebyshev_features(jnp.asarray(s), jnp.asarray(x), order=4))
    t = [x[0], s[0] @ x[0]]
    for _ in range(3):
        t.append(2 * s[0] @ t[-1] - t[-2])
    for k in range(5):
        np.testing.assert_allclose(feats[0, k], t[k], atol=1e-4)


def test_diffusion_powers():
    rng = np.random.default_rng(4)
    n = 5
    p = rng.random((1, n, n)).astype(np.float32) / n
    x = rng.standard_normal((1, n, 2)).astype(np.float32)
    feats = np.asarray(diffusion_features(jnp.asarray(p), jnp.asarray(x), 3))
    cur = x[0]
    for h in range(3):
        cur = p[0] @ cur
        np.testing.assert_allclose(feats[0, h], cur, atol=1e-4)
    picked = np.asarray(
        diffusion_features_at(jnp.asarray(p), jnp.asarray(x), (1, 3))
    )
    np.testing.assert_allclose(picked[0, 0], feats[0, 0], atol=1e-6)
    np.testing.assert_allclose(picked[0, 1], feats[0, 2], atol=1e-6)


def test_long_scale_features_equals_explicit():
    rng = np.random.default_rng(5)
    b, n, k, f, s_scales = 2, 7, 4, 3, 2
    v = rng.standard_normal((b, n, k)).astype(np.float32)
    fd = rng.standard_normal((b, s_scales, k)).astype(np.float32)
    x = rng.standard_normal((b, n, f)).astype(np.float32)
    out = np.asarray(long_scale_features(jnp.asarray(v), jnp.asarray(fd), jnp.asarray(x)))
    for bi in range(b):
        for si in range(s_scales):
            expl = v[bi] @ np.diag(fd[bi, si]) @ v[bi].T @ x[bi]
            np.testing.assert_allclose(out[bi, si], expl, atol=1e-4)


def test_graph_batch_pytree():
    import jax

    gb = GraphBatch(
        atom_type=jnp.zeros((2, 4), jnp.int32),
        node_feat=jnp.zeros((2, 4, 0)),
        ops=jnp.zeros((2, 3, 4, 4)),
        mask=jnp.ones((2, 4)),
        label=jnp.zeros((2, 5)),
    )
    leaves = jax.tree_util.tree_leaves(gb)
    assert len(leaves) == 5
    assert gb.batch_size == 2 and gb.n_max == 4 and gb.num_ops == 3
    assert gb.pair_mask().shape == (2, 4, 4)


def test_ops_with_self_channel():
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import make_batch

    rng = np.random.default_rng(0)
    batch = make_batch(rng, num=3, n_max=12)
    stacked = batch.ops_with_self()
    assert stacked.shape[1] == batch.ops.shape[1] + 1
    np.testing.assert_allclose(np.asarray(stacked[:, :-1]), np.asarray(batch.ops))
    # self channel = masked identity
    eye = np.asarray(stacked[:, -1])
    for g in range(3):
        np.testing.assert_allclose(
            eye[g], np.diag(np.asarray(batch.mask[g])), atol=1e-6
        )


def test_poly_scan_path_bf16_carry():
    """Orders past the unroll threshold take the lax.scan path, whose
    carry must be dtype-stable when fed bf16 activations (the step body
    emits f32 via preferred_element_type) — regression for the r3 bf16
    knob: poly_order/max_hop > 8 used to TypeError at trace time."""
    from lanczosnet_tpu.ops.poly import chebyshev_features, diffusion_features

    rng = np.random.default_rng(0)
    op = jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32)) * 0.1
    op = 0.5 * (op + op.transpose(0, 2, 1))
    x16 = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    for fn, order in ((chebyshev_features, 10), (diffusion_features, 10)):
        out = fn(op, x16, order)
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
        # scan path must agree with the unrolled path at matching order
        # (computed in f32 on both sides up to bf16 input rounding)
        out_f32 = fn(op, x16.astype(jnp.float32), order)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(out_f32),
            rtol=0.05, atol=0.05,
        )
