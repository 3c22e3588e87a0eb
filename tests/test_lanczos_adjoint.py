"""Adjoint-mode Lanczos VJP vs reverse-mode autodiff of the scan.

The hand-derived backward (`ops/lanczos.py:lanczos_adjoint_bwd`) must
produce the same operator cotangent as plain autodiff through
`lanczos_tridiag`, on full, padded, and breakdown graphs, and must
agree with central finite differences. The forward values themselves
must be bitwise-comparable (same ops, same order).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops.lanczos import (
    batched_lanczos_ritz,
    batched_lanczos_ritz_adjoint,
    lanczos_tridiag,
    lanczos_tridiag_adjoint,
)


def random_sym(rng, n, live):
    s = rng.standard_normal((n, n)).astype(np.float32) * 0.4
    s = 0.5 * (s + s.T)
    mask = np.zeros((n,), np.float32)
    mask[:live] = 1.0
    s[live:, :] = 0.0
    s[:, live:] = 0.0
    return jnp.asarray(s), jnp.asarray(mask)


def tridiag_loss(fn, s, mask, k):
    """Scalar touching alphas, betas and q with fixed random weights."""
    rng = np.random.default_rng(7)
    wa = jnp.asarray(rng.standard_normal(k).astype(np.float32))
    wb = jnp.asarray(rng.standard_normal(k - 1).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((k, s.shape[0])).astype(np.float32))
    a, b, q = fn(s, mask, k)
    return jnp.sum(wa * a) + jnp.sum(wb * b) + jnp.sum(wq * jnp.tanh(q))


def test_forward_identical():
    rng = np.random.default_rng(0)
    for live in (12, 7, 3, 1):
        s, mask = random_sym(rng, 12, live)
        a0, b0, q0 = lanczos_tridiag(s, mask, 6)
        a1, b1, q1 = lanczos_tridiag_adjoint(s, mask, 6)
        np.testing.assert_allclose(a0, a1, atol=1e-6)
        np.testing.assert_allclose(b0, b1, atol=1e-6)
        np.testing.assert_allclose(q0, q1, atol=1e-6)


def test_adjoint_matches_autodiff():
    rng = np.random.default_rng(1)
    k = 6
    for live in (12, 8, 4):  # full, padded, heavy breakdown (live < k)
        s, mask = random_sym(rng, 12, live)
        g_ref = jax.grad(lambda si: tridiag_loss(lanczos_tridiag, si, mask, k))(s)
        g_adj = jax.grad(
            lambda si: tridiag_loss(lanczos_tridiag_adjoint, si, mask, k)
        )(s)
        np.testing.assert_allclose(g_adj, g_ref, atol=2e-5, rtol=1e-4)


def test_adjoint_matches_finite_differences():
    rng = np.random.default_rng(2)
    n, k = 8, 4
    s, mask = random_sym(rng, n, n)

    def loss(si):
        si = 0.5 * (si + si.T)
        return tridiag_loss(lanczos_tridiag_adjoint, si, mask, k)

    g = np.asarray(jax.grad(loss)(s), np.float64)
    # FD along a handful of random symmetric directions
    for seed in range(4):
        d = np.random.default_rng(seed).standard_normal((n, n)).astype(np.float32)
        d = 0.5 * (d + d.T)
        h = 1e-3
        fp = float(loss(s + h * jnp.asarray(d)))
        fm = float(loss(s - h * jnp.asarray(d)))
        fd = (fp - fm) / (2 * h)
        an = float(np.sum(g * d))
        np.testing.assert_allclose(an, fd, rtol=5e-3, atol=5e-4)


def test_ritz_adjoint_matches_autodiff_batched():
    rng = np.random.default_rng(3)
    b, n, k = 4, 10, 5
    s = rng.standard_normal((b, n, n)).astype(np.float32) * 0.4
    s = 0.5 * (s + s.transpose(0, 2, 1))
    mask = np.ones((b, n), np.float32)
    for i, live in enumerate((n, 7, 4, 2)):
        mask[i, live:] = 0.0
        s[i, live:, :] = 0.0
        s[i, :, live:] = 0.0
    s, mask = jnp.asarray(s), jnp.asarray(mask)
    wv = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    def loss(fn, si):
        val, vec = fn(si, mask, k)
        # low-rank reconstruction, the shape the models consume
        recon = jnp.einsum("bnk,bk,bmk,bmf->bnf", vec, val, vec, x)
        return jnp.sum(jnp.tanh(recon)) + jnp.sum(wv * val)

    g_ref = jax.grad(lambda si: loss(batched_lanczos_ritz, si))(s)
    g_adj = jax.grad(lambda si: loss(batched_lanczos_ritz_adjoint, si))(s)
    np.testing.assert_allclose(g_adj, g_ref, atol=3e-5, rtol=1e-4)
