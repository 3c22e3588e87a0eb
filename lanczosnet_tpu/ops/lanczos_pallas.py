"""Pallas TPU kernel for batched K-step Lanczos tridiagonalization.

Same contract as `ops/lanczos.py:batched_lanczos_ritz` (the always-
correct `lax.scan` reference it is A/B-tested against in
tests/test_lanczos_pallas.py); replaces the reference's per-graph
scipy Lanczos (`utils/data_helper.py`) and the eager PyTorch loop in
`model/ada_lanczos_net.py` (SURVEY.md §2.6 native-equivalents table).

Kernel design (see /opt/skills/guides/pallas_guide.md):

- grid over tiles of ``G_TILE`` graphs; each program holds its tile's
  operators ``[G, N, N]``, masks ``[G, N]`` and the growing Lanczos
  basis ``[G, K, N]`` entirely in VMEM — zero HBM traffic between the
  K sequential steps (the XLA scan version round-trips the carry every
  step and launches ~K fused loop bodies).
- molecular N (≲32) is far below the 128-lane width, so the matvec
  ``w = S q`` is *not* an MXU matmul per graph: it is computed as a
  lane-wise multiply + reduce ``sum_j S[g,i,j] q[g,j]`` vectorized over
  the whole tile on the VPU — same trick for the CGS2 projections
  ``Qᵀ(Q w)``. All shapes stay 2D/3D with the last axis = N.
- breakdown (β ≤ ε) zeroes the next vector exactly like the scan
  version, so padded/rank-deficient graphs yield zero Ritz pairs.

Gradients: `lanczos_ritz_fast` wraps the kernel in `jax.custom_vjp`
whose backward re-runs the differentiable scan implementation under
`jax.vjp` — forward speed from Pallas, gradient correctness from the
reference path (they agree to tolerance by the A/B tests, so the VJP
is consistent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczosnet_tpu.ops.eigh import eigh_dispatch
from lanczosnet_tpu.ops.lanczos import (
    batched_lanczos_ritz,
    lanczos_start_vector,
    tridiag_matrix,
)

_VMEM_BUDGET = 6 * 1024 * 1024  # bytes of VMEM we allow the S tile to take


def _tile_bytes(g: int, n: int, k: int) -> int:
    """Per-program VMEM of the dominant buffers: S [g,n,n] + Q [g,k,n]."""
    return 4 * g * n * (n + k)


def _pick_tile(b: int, n: int, k: int) -> int:
    """Graphs per program, or 0 if the kernel is infeasible for (n, k).

    Mosaic requires the alpha/beta output block's lane dim (graphs) to
    be 128-divisible or span the whole array, so the tile is either ALL
    graphs (one program; molecular problems fit VMEM easily) or a
    multiple of 128 that fits the VMEM budget. Beyond molecular n the
    per-graph state alone outgrows VMEM — callers
    (`batched_lanczos_ritz_dispatch`) fall back to the scan
    implementation then."""
    if _tile_bytes(b, n, k) <= _VMEM_BUDGET:
        return b
    tiles = _VMEM_BUDGET // max(_tile_bytes(128, n, k), 1)
    if tiles >= 1:
        return int(tiles) * 128
    return 0


def _lanczos_kernel(s_ref, q0_ref, alpha_ref, beta_ref, q_ref, *, k: int,
                    eps: float):
    """One tile: s [G,N,N], q0 [G,N] → alphas [K,G], betas [K,G], q [G,K,N].

    q0 is the generic start vector computed by the host wrapper
    (`ops.lanczos.lanczos_start_vector`), shared with the scan
    implementation so both produce bit-comparable bases.

    alpha/beta are laid out ``[K, G]`` (step index on the *sublane* axis)
    because Mosaic only supports dynamically-indexed stores on sublanes,
    not lanes; the host wrapper transposes them back. q's dynamic step
    index also lands on a sublane axis ([G, K, N] → K is sublane).
    """
    s = s_ref[:]  # [G, N, N]
    q0 = q0_ref[:]  # [G, N]
    g, n = q0.shape

    q_ref[:] = jnp.zeros((g, k, n), jnp.float32)
    q_ref[:, 0, :] = q0
    alpha_ref[:] = jnp.zeros((k, g), jnp.float32)
    beta_ref[:] = jnp.zeros((k, g), jnp.float32)

    def step(j, carry):
        beta_prev, q_prev = carry  # [G,1], [G,N]
        q_j = q_ref[:, j, :]  # dynamic sublane read
        # w = S q_j  (VPU: broadcast-multiply + lane reduce)
        w = jnp.sum(s * q_j[:, None, :], axis=-1)  # [G, N]
        alpha = jnp.sum(q_j * w, axis=-1, keepdims=True)  # [G, 1]
        w = w - alpha * q_j - beta_prev * q_prev
        # full reorthogonalization, two CGS passes against all K rows
        # (rows beyond j are zero → projecting on them is a no-op)
        qb = q_ref[:]  # [G, K, N]
        for _ in range(2):
            proj = jnp.sum(qb * w[:, None, :], axis=-1)  # [G, K]
            w = w - jnp.sum(qb * proj[:, :, None], axis=1)  # [G, N]
        beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=-1, keepdims=True),
                                    eps * eps))
        valid = (beta > eps).astype(jnp.float32)  # [G, 1]
        q_next = valid * w / beta

        alpha_ref[j, :] = alpha[:, 0]
        beta_ref[j, :] = (beta * valid)[:, 0]

        @pl.when(j + 1 < k)
        def _():
            q_ref[:, j + 1, :] = q_next

        return (beta * valid, q_next)

    jax.lax.fori_loop(
        0, k, step, (jnp.zeros((g, 1), jnp.float32), jnp.zeros((g, n), jnp.float32))
    )


@partial(jax.jit, static_argnames=("k", "eps", "interpret"))
def lanczos_tridiag_pallas(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched tridiagonalization: s [B,N,N], mask [B,N] →
    (alphas [B,k], betas [B,k-1], q [B,k,N])."""
    b, n, _ = s.shape
    g_tile = _pick_tile(b, n, k)
    if g_tile == 0:
        raise ValueError(
            f"Lanczos Pallas kernel infeasible for n={n}, k={k} (per-graph "
            "state exceeds VMEM); use the lax.scan implementation "
            "(ops.lanczos.batched_lanczos_ritz / impl='scan')"
        )
    pad = (-b) % g_tile
    if pad:
        s = jnp.concatenate([s, jnp.zeros((pad, n, n), s.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, n), mask.dtype)])
    bp = b + pad

    alphas, betas, q = pl.pallas_call(
        partial(_lanczos_kernel, k=k, eps=eps),
        grid=(bp // g_tile,),
        in_specs=[
            pl.BlockSpec((g_tile, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, g_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, g_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, k, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, bp), jnp.float32),
            jax.ShapeDtypeStruct((bp, k, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        s.astype(jnp.float32),
        lanczos_start_vector(mask.astype(jnp.float32), eps),
    )
    alphas = alphas.T
    betas = betas.T
    return alphas[:b], betas[:b, : k - 1], q[:b]


def _ritz_from_tridiag(alphas, betas, q):
    """(alphas [B,k], betas [B,k-1], q [B,k,N]) → (vals [B,k], vecs [B,N,k])."""
    t = jax.vmap(tridiag_matrix)(alphas, betas)
    vals, u = eigh_dispatch(t)
    vecs = jnp.einsum("bkn,bku->bnu", q, u, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return vals, vecs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def batched_lanczos_ritz_fast(
    s: jnp.ndarray, mask: jnp.ndarray, k: int, eps: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-forward / scan-backward batched Ritz pairs.

    Drop-in for `ops.lanczos.batched_lanczos_ritz`: forward runs the
    fused VMEM kernel; backward differentiates the scan reference.
    """
    return _ritz_from_tridiag(*lanczos_tridiag_pallas(s, mask, k, eps))


def _fast_fwd(s, mask, k, eps):
    out = _ritz_from_tridiag(*lanczos_tridiag_pallas(s, mask, k, eps))
    return out, (s, mask)


def _fast_bwd(k, eps, res, g):
    s, mask = res
    _, vjp = jax.vjp(lambda si: batched_lanczos_ritz(si, mask, k, eps), s)
    (gs,) = vjp(g)
    return gs, None


batched_lanczos_ritz_fast.defvjp(_fast_fwd, _fast_bwd)


def batched_lanczos_ritz_dispatch(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
    impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select the Lanczos implementation.

    "auto": the fused Pallas kernel on TPU, the `lax.scan` reference
    everywhere else (CPU interpret-mode Pallas would be slower, and the
    scan is the correctness baseline). "pallas"/"scan" force a path.
    """
    if impl == "auto":
        feasible = _pick_tile(s.shape[0], s.shape[1], k) > 0
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and feasible
            else "scan"
        )
    if impl == "pallas":
        return batched_lanczos_ritz_fast(s, mask, k, eps)
    return batched_lanczos_ritz(s, mask, k, eps)
