"""A/B tests: batched Jacobi eigensolver vs LAPACK-path eigh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops.eigh import safe_eigh
from lanczosnet_tpu.ops.jacobi import jacobi_eigh
from lanczosnet_tpu.ops.lanczos import tridiag_matrix


def random_sym(rng, b, k):
    a = rng.standard_normal((b, k, k)).astype(np.float32)
    return jnp.asarray(0.5 * (a + a.transpose(0, 2, 1)))


@pytest.mark.parametrize("k", [4, 20, 21])
def test_jacobi_matches_eigh(k):
    rng = np.random.default_rng(0)
    a = random_sym(rng, 6, k)
    w_j, v_j = jacobi_eigh(a)
    w_r = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w_j), w_r, atol=5e-5)
    # reconstruction + orthonormality
    for g in range(a.shape[0]):
        vg = np.asarray(v_j[g])
        np.testing.assert_allclose(vg.T @ vg, np.eye(vg.shape[1]), atol=5e-5)
        rec = vg @ np.diag(np.asarray(w_j[g])) @ vg.T
        np.testing.assert_allclose(rec, np.asarray(a[g]), atol=5e-5)


@pytest.mark.parametrize("k", [48, 64])
def test_jacobi_large_k_scaled_sweeps(k):
    """eigh_dispatch scales the sweep budget past K=32; accuracy must
    hold at the largest supported width."""
    from lanczosnet_tpu.ops.eigh import _jacobi_sweeps

    rng = np.random.default_rng(2)
    a = random_sym(rng, 3, k)
    w_j, _ = jacobi_eigh(a, sweeps=_jacobi_sweeps(k))
    w_r = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w_j), w_r, atol=2e-4)


def test_eigh_dispatch_guards_large_k():
    """Explicit jacobi above the validated width must raise; 'auto'
    must silently route to safe_eigh instead of degrading."""
    from lanczosnet_tpu.ops.eigh import _JACOBI_MAX_K, eigh_dispatch

    k = _JACOBI_MAX_K + 4
    rng = np.random.default_rng(3)
    a = random_sym(rng, 2, k)
    with pytest.raises(ValueError):
        eigh_dispatch(a, impl="jacobi")
    w, _ = eigh_dispatch(a, impl="auto")  # falls back to lapack
    w_r = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_r, atol=1e-4)


def test_jacobi_tridiagonal_breakdown_zeros():
    # tridiagonal with a zero block (post-breakdown Lanczos shape)
    alphas = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
    betas = jnp.asarray([[0.5, 0.0, 0.0]])
    t = jax.vmap(tridiag_matrix)(alphas, betas)
    w_j, v_j = jacobi_eigh(t)
    w_r = np.linalg.eigvalsh(np.asarray(t))
    np.testing.assert_allclose(np.asarray(w_j), w_r, atol=1e-5)


def test_jacobi_grad_matches_safe_eigh():
    rng = np.random.default_rng(1)
    a = random_sym(rng, 3, 6)

    def loss_j(a):
        w, v = jacobi_eigh(a)
        return jnp.sum(w**2) + jnp.sum(v**4)

    def loss_s(a):
        w, v = safe_eigh(a)
        return jnp.sum(w**2) + jnp.sum(v**4)

    gj = jax.grad(loss_j)(a)
    gs = jax.grad(loss_s)(a)
    # eigenvector sign freedom: v**4 is sign-invariant, so grads agree
    np.testing.assert_allclose(np.asarray(gj), np.asarray(gs), rtol=1e-3,
                               atol=1e-4)


def test_jacobi_degenerate_stable():
    a = jnp.broadcast_to(jnp.eye(5), (2, 5, 5)) * 2.0  # fully degenerate
    w, v = jacobi_eigh(a)
    assert np.isfinite(np.asarray(w)).all()
    np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-6)
    g = jax.grad(lambda a: jnp.sum(jacobi_eigh(a)[0] ** 2))(a)
    assert np.isfinite(np.asarray(g)).all()
