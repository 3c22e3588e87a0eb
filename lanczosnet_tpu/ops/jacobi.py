"""Batched symmetric eigensolver via parallel-order cyclic Jacobi.

Replaces `jnp.linalg.eigh` for the K×K tridiagonal Ritz systems
(SURVEY.md §2.6: "batched tridiagonal eigensolver … implicit-QL-style").
XLA's LAPACK-style eigh lowers to sequential QR iteration that is the
dominant cost of the whole Ritz path on TPU (~17 ms of 19.5 ms at
B=256, K=20 — measured); this solver instead runs a fixed number of
Jacobi sweeps where each round applies K/2 *disjoint* rotations at once
as two batched [B,K,K] matmuls — pure MXU work, identical cost for
every batch element, no convergence-dependent control flow.

Round-robin ("tournament") ordering: K-1 rounds of K/2 disjoint pairs
cover all off-diagonal entries once per sweep; quadratic convergence
gives ~1e-6 off-diagonal mass after ~8 sweeps for K ≤ 32.

Gradients use the same degeneracy-clamped eigh VJP as `ops.eigh.
safe_eigh` (the solver is an implementation detail of the same math).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops.eigh import _bwd as _eigh_bwd


def _round_robin_pairs(k: int) -> np.ndarray:
    """[k-1, k/2, 2] disjoint pair indices covering all (i<j) per sweep.

    Classic circle method: player 0 fixed, others rotate.
    """
    assert k % 2 == 0, "pad to even k"
    others = list(range(1, k))
    rounds = []
    for _ in range(k - 1):
        lineup = [0] + others
        pairs = [
            (lineup[i], lineup[k - 1 - i]) for i in range(k // 2)
        ]
        rounds.append([(min(p), max(p)) for p in pairs])
        others = [others[-1]] + others[:-1]
    return np.asarray(rounds, np.int32)


@partial(jax.jit, static_argnames=("sweeps",))
def _jacobi(a: jnp.ndarray, sweeps: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core iteration. a [..., K, K] symmetric → (w [..., K], v [..., K, K])."""
    k = a.shape[-1]
    pad = k % 2
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 1)])
        k = k + 1
    batch_shape = a.shape[:-2]
    a = a.reshape((-1, k, k))
    b = a.shape[0]

    rounds = _round_robin_pairs(k)  # [R, k/2, 2]
    # one-hot selectors per round: P,Q [R, k/2, k]
    eye = np.eye(k, dtype=np.float32)
    p_sel = jnp.asarray(eye[rounds[:, :, 0]])
    q_sel = jnp.asarray(eye[rounds[:, :, 1]])

    v0 = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), (b, k, k))

    def round_step(carry, sel):
        a, v = carry
        p, q = sel  # [k/2, k] each
        # gather the 2x2 blocks for every pair: app, aqq, apq  [B, k/2]
        ap_rows = jnp.einsum("mk,bkl->bml", p, a, precision=jax.lax.Precision.HIGHEST)  # [B, k/2, k]
        app = jnp.einsum("bml,ml->bm", ap_rows, p, precision=jax.lax.Precision.HIGHEST)
        apq = jnp.einsum("bml,ml->bm", ap_rows, q, precision=jax.lax.Precision.HIGHEST)
        aqq = jnp.einsum("mk,bkl,ml->bm", q, a, q, precision=jax.lax.Precision.HIGHEST)
        # rotation angle: theta = 0.5 atan2(2 apq, aqq - app)
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        # J = I + Σ_m (c-1)(pp^T + qq^T) + s(pq^T) - s(qp^T)   [B, k, k]
        hi = jax.lax.Precision.HIGHEST
        jrot = (
            jnp.eye(k, dtype=a.dtype)[None]
            + jnp.einsum("bm,mk,ml->bkl", c - 1.0, p, p, precision=hi)
            + jnp.einsum("bm,mk,ml->bkl", c - 1.0, q, q, precision=hi)
            + jnp.einsum("bm,mk,ml->bkl", s, p, q, precision=hi)
            - jnp.einsum("bm,mk,ml->bkl", s, q, p, precision=hi)
        )
        a = jnp.einsum(
            "bki,bkl,blj->bij", jrot, a, jrot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        a = 0.5 * (a + jnp.swapaxes(a, -1, -2))  # kill rounding drift
        v = jnp.einsum("bkl,blj->bkj", v, jrot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return (a, v), None

    sel_seq = jnp.concatenate([jnp.stack([p_sel, q_sel], 1)] * sweeps, 0)
    (a, v), _ = jax.lax.scan(round_step, (a, v0), sel_seq)

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    if pad:
        # padded row decouples (zero row/col → eigenvalue 0); drop it
        keep = k - 1
        # the zero eigenvalue may sort anywhere among zeros; drop the
        # column whose padded-row weight is largest
        pad_weight = jnp.abs(v[:, keep, :])
        drop = jnp.argmax(pad_weight, axis=-1)  # [B]
        cols = jnp.arange(k)[None, :] != drop[:, None]
        idx = jnp.argsort(~cols, axis=-1)[:, : keep]  # kept columns, ordered
        w = jnp.take_along_axis(w, idx, axis=-1)
        v = jnp.take_along_axis(v[:, :keep, :], idx[:, None, :], axis=-1)
    return (
        w.reshape(batch_shape + (w.shape[-1],)),
        v.reshape(batch_shape + v.shape[-2:]),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def jacobi_eigh(a: jnp.ndarray, sweeps: int = 8):
    """Drop-in for `safe_eigh` with a fixed-sweep Jacobi iteration.

    Returns ``(w ascending, v)`` with ``a ≈ v diag(w) vᵀ``; same
    degeneracy-clamped VJP as `ops.eigh.safe_eigh`.
    """
    sym = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    return _jacobi(sym, sweeps)


def _jfwd(a, sweeps):
    w, v = jacobi_eigh(a, sweeps)
    return (w, v), (w, v)


def _jbwd(sweeps, res, grads):
    return _eigh_bwd(res, grads)


jacobi_eigh.defvjp(_jfwd, _jbwd)
