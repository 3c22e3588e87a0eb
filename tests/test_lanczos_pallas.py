"""A/B tests: Pallas Lanczos kernel vs the lax.scan reference
(SURVEY.md §7.3b: same interface, tested against the scan version).

On CPU these run the kernel in interpreter mode; the numerical contract
(orthonormal basis, tridiagonal recovery, breakdown handling, Ritz
reconstruction) is identical either way.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops.lanczos import batched_lanczos_ritz, lanczos_tridiag
from lanczosnet_tpu.ops.lanczos_pallas import (
    batched_lanczos_ritz_fast,
    lanczos_tridiag_pallas,
)

INTERPRET = jax.default_backend() != "tpu"


def random_spd_batch(rng, b=5, n=12, mask_counts=None):
    s = rng.standard_normal((b, n, n)).astype(np.float32) * 0.3
    s = 0.5 * (s + s.transpose(0, 2, 1))
    mask = np.zeros((b, n), np.float32)
    counts = mask_counts or [n, n - 3, 4, 1, n]
    for i, c in enumerate(counts[:b]):
        mask[i, :c] = 1.0
        s[i, c:, :] = 0.0
        s[i, :, c:] = 0.0
    return jnp.asarray(s), jnp.asarray(mask)


def test_pallas_matches_scan_tridiag():
    rng = np.random.default_rng(0)
    s, mask = random_spd_batch(rng)
    k = 6
    a_p, b_p, q_p = lanczos_tridiag_pallas(s, mask, k, interpret=INTERPRET)
    for g in range(s.shape[0]):
        a_s, b_s, q_s = lanczos_tridiag(s[g], mask[g], k)
        np.testing.assert_allclose(a_p[g], a_s, atol=1e-4)
        np.testing.assert_allclose(b_p[g], b_s, atol=1e-4)
        # basis may differ in sign only when breakdown restarts differ;
        # with identical algorithm they should match directly
        np.testing.assert_allclose(q_p[g], q_s, atol=1e-4)


def test_pallas_orthonormal_and_tridiagonal():
    rng = np.random.default_rng(1)
    s, mask = random_spd_batch(rng, b=4, n=16, mask_counts=[16, 10, 7, 16])
    k = 8
    a_p, b_p, q_p = lanczos_tridiag_pallas(s, mask, k, interpret=INTERPRET)
    for g in range(4):
        q = np.asarray(q_p[g])  # [k, n]
        gram = q @ q.T
        nz = np.abs(np.diag(gram)) > 0.5  # live rows
        live = gram[np.ix_(nz, nz)]
        np.testing.assert_allclose(live, np.eye(live.shape[0]), atol=1e-4)
        # T = Q S Q^T tridiagonal with the returned diagonals
        t = q @ np.asarray(s[g]) @ q.T
        np.testing.assert_allclose(np.diag(t)[nz], np.asarray(a_p[g])[nz],
                                   atol=1e-4)


def test_pallas_ritz_matches_scan_reconstruction():
    rng = np.random.default_rng(2)
    s, mask = random_spd_batch(rng, b=3, n=10, mask_counts=[10, 6, 10])
    k = 10
    d_f, v_f = batched_lanczos_ritz_fast(s, mask, k) if not INTERPRET else (
        None, None)
    if INTERPRET:
        # custom_vjp path uses the kernel; in interpret mode call pieces
        from lanczosnet_tpu.ops.lanczos_pallas import _ritz_from_tridiag

        d_f, v_f = _ritz_from_tridiag(
            *lanczos_tridiag_pallas(s, mask, k, interpret=True)
        )
    d_s, v_s = batched_lanczos_ritz(s, mask, k)
    # compare the operator reconstruction V diag(D) V^T (basis-invariant)
    for g in range(3):
        rec_f = np.asarray(v_f[g]) @ np.diag(np.asarray(d_f[g])) @ np.asarray(
            v_f[g]).T
        rec_s = np.asarray(v_s[g]) @ np.diag(np.asarray(d_s[g])) @ np.asarray(
            v_s[g]).T
        np.testing.assert_allclose(rec_f, rec_s, atol=1e-3)
        # full-K Lanczos on a masked operator reproduces it exactly
        n_real = int(np.asarray(mask[g]).sum())
        if n_real == 10:
            np.testing.assert_allclose(rec_f, np.asarray(s[g]), atol=1e-3)


def test_pallas_breakdown_zero_graph():
    s = jnp.zeros((2, 8, 8))
    mask = jnp.zeros((2, 8)).at[0, :3].set(1.0)
    a, b, q = lanczos_tridiag_pallas(s, mask, 4, interpret=INTERPRET)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(q)).all()
    # zero operator: alpha=0, beta=0, only q0 lives (row 0 of graph 0)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-6)
    assert np.linalg.norm(np.asarray(q[1])) == pytest.approx(0.0, abs=1e-6)


def test_fast_vjp_matches_scan_grad():
    rng = np.random.default_rng(3)
    s, mask = random_spd_batch(rng, b=2, n=8, mask_counts=[8, 5])
    k = 4

    def loss_fast(s):
        d, v = batched_lanczos_ritz_fast(s, mask, k, interpret=INTERPRET)
        return jnp.sum(d**2) + jnp.sum(v**4)

    def loss_scan(s):
        d, v = batched_lanczos_ritz(s, mask, k)
        return jnp.sum(d**2) + jnp.sum(v**4)

    g_fast = jax.grad(loss_fast)(s)
    g_scan = jax.grad(loss_scan)(s)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_scan),
                               rtol=1e-3, atol=1e-4)


def test_pick_tile_vmem_rules():
    from lanczosnet_tpu.ops.lanczos_pallas import _VMEM_BUDGET, _pick_tile, _tile_bytes

    # molecular shapes: one program over all graphs
    assert _pick_tile(256, 32, 20) == 256
    # big batch, small n: multiple-of-128 tiles fitting the budget
    t = _pick_tile(100_000, 32, 20)
    assert t % 128 == 0 and _tile_bytes(t, 32, 20) <= _VMEM_BUDGET
    # n too large for even one 128-graph tile: infeasible -> 0
    assert _pick_tile(4, 2708, 20) == 0


def test_stream_block_rules():
    from lanczosnet_tpu.ops.lanczos_pallas import (
        _STREAM_VMEM_BUDGET, _pick_stream_block, _stream_bytes,
    )

    # citation scale streams with a healthy block
    bn = _pick_stream_block(2708, 20)
    assert bn in (128, 256, 512)
    n_pad = -(-2708 // bn) * bn
    assert _stream_bytes(bn, n_pad, 20) <= _STREAM_VMEM_BUDGET
    # far beyond VMEM even at the smallest block: infeasible
    assert _pick_stream_block(200_000, 20) == 0
    # a block never exceeds the 128-aligned N: a 128-node graph must
    # stream in one 128-row block, not a 4x zero-padded 512 one
    assert _pick_stream_block(128, 20) == 128
    assert _pick_stream_block(130, 20) == 256


def test_stream_kernel_matches_scan_residuals():
    from lanczosnet_tpu.ops.lanczos import _lanczos_fwd_resid
    from lanczosnet_tpu.ops.lanczos_pallas import _lanczos_stream_call

    rng = np.random.default_rng(7)
    b, n, k = 2, 300, 8
    s = rng.standard_normal((b, n, n)).astype(np.float32) * 0.1
    s = 0.5 * (s + s.transpose(0, 2, 1))
    mask = np.ones((b, n), np.float32)
    mask[1, 200:] = 0.0
    s[1, 200:, :] = 0.0
    s[1, :, 200:] = 0.0
    s, mask = jnp.asarray(s), jnp.asarray(mask)
    a_p, bf_p, q_p, p1_p, p2_p, w4_p = _lanczos_stream_call(
        s, mask, k, 1e-6, bn=128, interpret=INTERPRET
    )
    for g in range(b):
        a_s, bf_s, q_s, p1_s, p2_s, w4_s = _lanczos_fwd_resid(
            s[g], mask[g], k, 1e-6
        )
        np.testing.assert_allclose(a_p[g], a_s, atol=1e-4)
        np.testing.assert_allclose(bf_p[g], bf_s, atol=1e-4)
        np.testing.assert_allclose(q_p[g], q_s, atol=1e-4)
        np.testing.assert_allclose(p1_p[g], p1_s, atol=1e-4)
        np.testing.assert_allclose(p2_p[g], p2_s, atol=1e-4)
        np.testing.assert_allclose(w4_p[g], w4_s, atol=1e-4)


def test_stream_vjp_matches_scan_grad_large_n(monkeypatch):
    """A/B grad check through the streamed path (VERDICT round-1 #3:
    adjoint grads must work past molecular N; run at citation scale on
    TPU, a CI-sized N here — the VMEM budget is pinched so the resid
    dispatcher picks the streamed kernel at this n)."""
    import lanczosnet_tpu.ops.lanczos_pallas as lp

    monkeypatch.setattr(lp, "_VMEM_BUDGET", 0)  # molecular infeasible
    rng = np.random.default_rng(8)
    b, n, k = 1, 300, 6
    assert lp._pick_tile(b, n, k) == 0  # molecular kernel infeasible here
    assert lp._pick_stream_block(n, k) > 0  # streamed kernel takes over
    s = rng.standard_normal((b, n, n)).astype(np.float32) * 0.05
    s = 0.5 * (s + s.transpose(0, 2, 1))
    mask = jnp.ones((b, n), jnp.float32)
    s = jnp.asarray(s)
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    def loss(fn):
        def f(si):
            d, v = fn(si, mask, k)
            recon = jnp.einsum("bnk,bk,bmk,bmf->bnf", v, d, v, x)
            return jnp.sum(jnp.tanh(recon))
        return f

    g_scan = jax.grad(loss(batched_lanczos_ritz))(s)
    g_fast = jax.grad(loss(
        lambda si, m, kk: batched_lanczos_ritz_fast(si, m, kk,
                                                    interpret=INTERPRET)
    ))(s)
    scale = float(jnp.max(jnp.abs(g_scan)))
    np.testing.assert_allclose(
        np.asarray(g_fast) / scale, np.asarray(g_scan) / scale, atol=2e-4
    )


def test_dispatch_falls_back_when_infeasible():
    from lanczosnet_tpu.ops.lanczos_pallas import batched_lanczos_ritz_dispatch

    # runs (on any backend): auto resolves to scan off-TPU, and to the
    # streamed kernel on TPU now that n=300 is stream-feasible
    n = 300  # > VMEM-feasible for a 128-tile at this n
    s = jnp.zeros((1, n, n))
    mask = jnp.ones((1, n))
    d, v = batched_lanczos_ritz_dispatch(s, mask, 8, impl="auto")
    assert np.isfinite(np.asarray(d)).all()
