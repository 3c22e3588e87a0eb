"""Lanczos kernel correctness vs dense eigh / scipy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from lanczosnet_tpu.ops.lanczos import (
    batched_lanczos_ritz,
    lanczos_ritz,
    lanczos_tridiag,
    tridiag_matrix,
)
from lanczosnet_tpu.ops.eigh import safe_eigh
from lanczosnet_tpu.ops.normalize import sym_normalize


def _random_graph_operator(rng, n, n_valid):
    """Random symmetric-normalized adjacency with padding."""
    a = (rng.random((n, n)) < 0.4).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    mask = np.zeros(n, np.float32)
    mask[:n_valid] = 1.0
    s = np.asarray(sym_normalize(jnp.asarray(a), jnp.asarray(mask)))
    return s, mask


def test_lanczos_vectors_orthonormal():
    rng = np.random.default_rng(0)
    s, mask = _random_graph_operator(rng, 16, 16)
    k = 8
    alphas, betas, q = lanczos_tridiag(jnp.asarray(s), jnp.asarray(mask), k)
    gram = np.asarray(q @ q.T)
    np.testing.assert_allclose(gram, np.eye(k), atol=1e-5)


def test_lanczos_reproduces_tridiagonal():
    """Q S Q^T must equal the tridiagonal T built from (alphas, betas)."""
    rng = np.random.default_rng(1)
    s, mask = _random_graph_operator(rng, 16, 16)
    k = 8
    alphas, betas, q = lanczos_tridiag(jnp.asarray(s), jnp.asarray(mask), k)
    t = np.asarray(tridiag_matrix(alphas, betas))
    qsq = np.asarray(q @ s @ q.T)
    np.testing.assert_allclose(qsq, t, atol=1e-5)


def test_full_k_recovers_dense_spectrum():
    """With k == n_valid, Ritz values equal the exact eigenvalues."""
    rng = np.random.default_rng(2)
    n_valid = 10
    s, mask = _random_graph_operator(rng, 10, n_valid)
    d, v = lanczos_ritz(jnp.asarray(s), jnp.asarray(mask), n_valid)
    exact = scipy.linalg.eigh(s, eigvals_only=True)
    np.testing.assert_allclose(np.sort(np.asarray(d)), np.sort(exact), atol=1e-4)
    # And the reconstruction matches the operator itself.
    recon = np.asarray(v) @ np.diag(np.asarray(d)) @ np.asarray(v).T
    np.testing.assert_allclose(recon, s, atol=1e-4)


def test_padded_nodes_do_not_leak():
    """Ritz vectors must be exactly zero on padded nodes."""
    rng = np.random.default_rng(3)
    s, mask = _random_graph_operator(rng, 24, 9)
    d, v = lanczos_ritz(jnp.asarray(s), jnp.asarray(mask), 12)
    v = np.asarray(v)
    assert np.abs(v[9:]).max() < 1e-6


def test_breakdown_on_small_graph():
    """k > n_valid forces breakdown; result must stay finite and the
    reconstruction must stay exact on the Krylov subspace (Lanczos can
    only see the part of the spectrum reachable from the start vector —
    that is inherent, the reference behaves identically)."""
    rng = np.random.default_rng(4)
    s, mask = _random_graph_operator(rng, 16, 5)
    d, v = lanczos_ritz(jnp.asarray(s), jnp.asarray(mask), 12)
    d, v = np.asarray(d), np.asarray(v)
    assert np.isfinite(d).all() and np.isfinite(v).all()
    # S q0 lies in the Krylov space -> V diag(D) V^T q0 == S q0 exactly.
    from lanczosnet_tpu.ops.lanczos import lanczos_start_vector

    q0 = np.asarray(lanczos_start_vector(jnp.asarray(mask)))
    recon_q0 = v @ (d * (v.T @ q0))
    np.testing.assert_allclose(recon_q0, s @ q0, atol=1e-4)


def test_regular_graph_no_rank_collapse():
    """A cycle (2-regular) graph: the constant vector is an eigenvector,
    so a naive mask-derived start vector breaks down after one step and
    collapses the Ritz pairs to rank 1. The generic start vector must
    recover (close to) the full K-dim spectrum."""
    n, k = 12, 8
    a = np.zeros((n, n), np.float32)
    for i in range(n):
        a[i, (i + 1) % n] = a[(i + 1) % n, i] = 1.0
    s = a / 2.0  # sym-normalized 2-regular ring
    mask = np.ones(n, np.float32)
    d, v = lanczos_ritz(jnp.asarray(s), jnp.asarray(mask), k)
    d = np.asarray(d)
    # at least k-2 distinct, nonzero Ritz values survive
    nonzero = np.abs(d) > 1e-5
    assert nonzero.sum() >= k - 2, d
    # Ritz values are true eigenvalue estimates: all within spectrum
    evals = np.linalg.eigvalsh(s)
    assert d.min() >= evals.min() - 1e-4 and d.max() <= evals.max() + 1e-4
    # reconstruction beats the rank-1 graph-mean projection (what the
    # old constant start vector collapsed to)
    rec = np.asarray(v) @ np.diag(d) @ np.asarray(v).T
    ones = np.ones(n) / np.sqrt(n)
    rank1 = np.outer(ones, ones)  # eigenvalue-1 projector
    assert np.linalg.norm(rec - s) < 0.8 * np.linalg.norm(rank1 - s)


def test_batched_matches_single():
    rng = np.random.default_rng(5)
    mats, masks = [], []
    for n_valid in (6, 12, 16):
        s, m = _random_graph_operator(rng, 16, n_valid)
        mats.append(s)
        masks.append(m)
    sb = jnp.asarray(np.stack(mats))
    mb = jnp.asarray(np.stack(masks))
    db, vb = batched_lanczos_ritz(sb, mb, 8)
    for i in range(3):
        di, vi = lanczos_ritz(sb[i], mb[i], 8)
        np.testing.assert_allclose(np.asarray(db[i]), np.asarray(di), atol=1e-5)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(vi), atol=1e-5)


def test_low_rank_approximation_quality():
    """V f(D) V^T X with f=identity^t approximates S^t X for smooth t."""
    rng = np.random.default_rng(6)
    s, mask = _random_graph_operator(rng, 20, 20)
    k = 20  # full rank -> exact
    d, v = lanczos_ritz(jnp.asarray(s), jnp.asarray(mask), k)
    x = rng.standard_normal((20, 4)).astype(np.float32)
    t = 5
    exact = np.linalg.matrix_power(s, t) @ x
    approx = np.asarray(v) @ (np.asarray(d)[:, None] ** t * (np.asarray(v).T @ x))
    np.testing.assert_allclose(approx, exact, atol=1e-3)


def test_gradient_flows_through_lanczos():
    """AdaLanczosNet path: d loss/d S through the full recursion is finite
    and matches finite differences."""
    rng = np.random.default_rng(7)
    n, k = 8, 5
    a = rng.standard_normal((n, n)).astype(np.float32)
    mask = jnp.ones(n, jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    def loss(a_raw):
        s = 0.5 * (a_raw + a_raw.T)
        d, v = lanczos_ritz(s, mask, k)
        z = v @ (d[:, None] * (v.T @ x))
        return jnp.sum(z * z)

    g = jax.grad(loss)(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()

    # Finite-difference check on a handful of entries.
    f0 = float(loss(jnp.asarray(a)))
    epsfd = 1e-3
    for (i, j) in [(0, 0), (1, 3), (4, 2)]:
        ap = a.copy()
        ap[i, j] += epsfd
        am = a.copy()
        am[i, j] -= epsfd
        fd = (float(loss(jnp.asarray(ap))) - float(loss(jnp.asarray(am)))) / (2 * epsfd)
        assert abs(fd - float(g[i, j])) < 5e-2 * max(1.0, abs(fd)), (i, j, fd, float(g[i, j]))


def test_gradient_finite_under_breakdown():
    """Gradients must not NaN when beta hits the breakdown guard."""
    n, k = 6, 6
    mask = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32)
    a = np.zeros((n, n), np.float32)
    a[0, 1] = a[1, 0] = 1.0  # rank-deficient: node 2 isolated
    x = jnp.ones((n, 2), jnp.float32)

    def loss(a_raw):
        s = sym_normalize(0.5 * (a_raw + a_raw.T), mask)
        d, v = lanczos_ritz(s, mask, k)
        z = v @ (d[:, None] * (v.T @ x))
        return jnp.sum(z * z)

    g = jax.grad(loss)(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()


def test_safe_eigh_degenerate_grad():
    a = jnp.eye(4)  # fully degenerate spectrum

    def loss(m):
        w, v = safe_eigh(m)
        return jnp.sum(w**2) + jnp.sum(v * v)

    g = jax.grad(loss)(a)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("n_valid", [3, 10, 16])
def test_vs_scipy_tridiagonal(n_valid):
    """alphas/betas define the same spectrum scipy's eigh_tridiagonal sees."""
    rng = np.random.default_rng(8)
    s, mask = _random_graph_operator(rng, 16, n_valid)
    k = min(8, n_valid)
    alphas, betas, _ = lanczos_tridiag(jnp.asarray(s), jnp.asarray(mask), k)
    alphas, betas = np.asarray(alphas, np.float64), np.asarray(betas, np.float64)
    ours = np.sort(np.asarray(safe_eigh(tridiag_matrix(jnp.asarray(alphas), jnp.asarray(betas)))[0]))
    sp = np.sort(scipy.linalg.eigh_tridiagonal(alphas, betas, eigvals_only=True))
    np.testing.assert_allclose(ours, sp, atol=1e-5)


def test_grad_matches_finite_differences():
    """SURVEY.md §4: custom-VJP/autodiff grad check vs finite differences
    on a small masked operator, including a padded graph."""
    rng = np.random.default_rng(7)
    n, k = 6, 4
    s = rng.standard_normal((2, n, n)).astype(np.float32) * 0.3
    s = 0.5 * (s + s.transpose(0, 2, 1))
    mask = np.ones((2, n), np.float32)
    mask[1, 4:] = 0.0
    s[1, 4:, :] = 0.0
    s[1, :, 4:] = 0.0
    s = jnp.asarray(s)
    maskj = jnp.asarray(mask)

    def loss(sv):
        d, v = batched_lanczos_ritz(sv, maskj, k)
        return jnp.sum(d**2) + jnp.sum(v**4)

    g = np.asarray(jax.grad(loss)(s))
    eps = 3e-3
    rng2 = np.random.default_rng(8)
    for _ in range(6):
        direction = rng2.standard_normal(s.shape).astype(np.float32)
        direction = 0.5 * (direction + direction.transpose(0, 2, 1))
        direction[1, 4:, :] = 0.0
        direction[1, :, 4:] = 0.0
        dj = jnp.asarray(direction)
        fd = (float(loss(s + eps * dj)) - float(loss(s - eps * dj))) / (2 * eps)
        an = float(np.sum(g * direction))
        assert abs(fd - an) < 5e-2 * max(abs(fd), abs(an), 1.0), (fd, an)
