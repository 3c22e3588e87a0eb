"""Pallas TPU kernel for batched K-step Lanczos tridiagonalization.

Same contract as `ops/lanczos.py:batched_lanczos_ritz` (the always-
correct `lax.scan` reference it is A/B-tested against in
tests/test_lanczos_pallas.py); replaces the reference's per-graph
scipy Lanczos (`utils/data_helper.py`) and the eager PyTorch loop in
`model/ada_lanczos_net.py` (SURVEY.md §2.6 native-equivalents table).

Kernel design (see /opt/skills/guides/pallas_guide.md):

- grid over tiles of ``G_TILE`` graphs; each program holds its tile's
  operators, start vectors and the growing Lanczos basis entirely in
  VMEM — zero HBM traffic between the K sequential steps (the XLA scan
  version round-trips the carry every step and launches ~K fused loop
  bodies).
- **graphs ride the lane axis.** Molecular N (≲32) is far below the
  128-lane width, so any ``[..., N]``-last layout pads every buffer and
  every VPU op 4× (and OOMs scoped VMEM at large tiles). Instead all
  kernel arrays are ``[..., G]`` with G a multiple of 128 (or the whole
  batch): operators ``[N, N, G]``, basis ``[K, N, G]``. The matvec
  ``w[i,g] = Σ_j S[i,j,g]·q[j,g]`` and the CGS2 projections are
  multiply + *sublane* reduces, fully lane-packed on the VPU.
- breakdown (β ≤ ε) zeroes the next vector exactly like the scan
  version, so padded/rank-deficient graphs yield zero Ritz pairs.

Gradients: the kernel also writes the adjoint residuals (CGS projection
coefficients p1/p2 and pre-normalization vectors w4), and
`batched_lanczos_ritz_fast` wraps it in a `jax.custom_vjp` whose
backward runs the hand-derived adjoint recursion
(`ops.lanczos.lanczos_adjoint_bwd`) — one transposed matvec per step
plus a single MXU matmul for the operator cotangent, instead of the
round-1 design that replayed the entire scan forward inside the
backward (VERDICT.md round-1 weakness #3).
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
    lanczos_adjoint_bwd,
    lanczos_start_vector,
    tridiag_matrix,
)

_VMEM_BUDGET = 6 * 1024 * 1024  # bytes of VMEM we allow the S tile to take


def _tile_bytes(g: int, n: int, k: int) -> int:
    """Per-program VMEM estimate (graphs-on-lanes layout, unpadded):
    S [n,n,g] + its broadcast temp, basis/w4 [k,n,g] + CGS temp,
    p1/p2 [k,k,g]."""
    return 4 * g * (2 * n * n + 3 * k * n + 2 * k * k)


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


def _lanczos_kernel(s_ref, q0_ref, alpha_ref, beta_ref, q_ref, p1_ref,
                    p2_ref, w4_ref, *, k: int, eps: float):
    """One tile, graphs-on-lanes layout.

    s [N,N,G], q0 [N,G] → alphas [K,G], betas [K,G], q [K,N,G], plus
    adjoint residuals p1/p2 [K,K,G] and w4 [K,N,G].

    q0 is the generic start vector computed by the host wrapper
    (`ops.lanczos.lanczos_start_vector`), shared with the scan
    implementation so both produce bit-comparable bases.

    Every per-step store indexes the *leading* (step) axis — Mosaic
    supports dynamically-indexed stores on non-lane axes only — and the
    lane axis is always G, so nothing is padded to 128 and the VPU ops
    run fully lane-packed. The host wrapper transposes G back to the
    front.
    """
    s = s_ref[:]  # [N, N, G]
    q0 = q0_ref[:]  # [N, G]
    n, g = q0.shape

    q_ref[:] = jnp.zeros((k, n, g), jnp.float32)
    q_ref[0] = q0
    alpha_ref[:] = jnp.zeros((k, g), jnp.float32)
    beta_ref[:] = jnp.zeros((k, g), jnp.float32)

    def step(j, carry):
        beta_prev, q_prev = carry  # [G], [N, G]
        q_j = q_ref[j]  # [N, G] dynamic leading-axis read
        # w[i,g] = Σ_j s[i,j,g] q[j,g]  (VPU multiply + sublane reduce)
        w = jnp.sum(s * q_j[None, :, :], axis=1)  # [N, G]
        alpha = jnp.sum(q_j * w, axis=0)  # [G]
        w = w - alpha[None, :] * q_j - beta_prev[None, :] * q_prev
        # full reorthogonalization, two CGS passes against all K rows
        # (rows beyond j are zero → projecting on them is a no-op);
        # the projection coefficients are the adjoint-VJP residuals
        qb = q_ref[:]  # [K, N, G]
        proj1 = jnp.sum(qb * w[None, :, :], axis=1)  # [K, G]
        w = w - jnp.sum(qb * proj1[:, None, :], axis=0)  # [N, G]
        proj2 = jnp.sum(qb * w[None, :, :], axis=1)  # [K, G]
        w = w - jnp.sum(qb * proj2[:, None, :], axis=0)  # [N, G]
        beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0), eps * eps))  # [G]
        valid = (beta > eps).astype(jnp.float32)  # [G]
        q_next = valid[None, :] * w / beta[None, :]

        alpha_ref[j] = alpha
        beta_ref[j] = beta * valid
        p1_ref[j] = proj1
        p2_ref[j] = proj2
        w4_ref[j] = w

        @pl.when(j + 1 < k)
        def _():
            q_ref[j + 1] = q_next

        return (beta * valid, q_next)

    jax.lax.fori_loop(
        0, k, step,
        (jnp.zeros((g,), jnp.float32), jnp.zeros((n, g), jnp.float32)),
    )


# ---------------------------------------------------------------------------
# HBM-streamed kernel for large N (citation-scale AdaLanczosNet).
#
# Past molecular sizes the [N, N] operator no longer fits VMEM, so the
# matvec is tiled over row blocks: grid (B, K, NB), the pipeline
# streams S row-blocks HBM→VMEM (double-buffered, overlapping the
# previous block's compute), while the basis, the w accumulator and the
# adjoint residuals stay VMEM-resident across the whole K-loop. The
# operator MUST be symmetric (always true here — Lanczos requires it):
# the row-block partial is computed as ``w += q_segᵀ · S[rows, :]``,
# an MXU matmul whose output is already laid out on the lane axis, so
# no dynamically-indexed lane stores are needed anywhere.
# ---------------------------------------------------------------------------

_STREAM_VMEM_BUDGET = 10 * 1024 * 1024


def _stream_bytes(bn: int, n_pad: int, k: int) -> int:
    """S block (double-buffered) + resident q/w4 outputs + CGS temp."""
    return 4 * (2 * bn * n_pad + 3 * k * n_pad + 2 * k * k + 2 * n_pad)


def _pick_stream_block(n: int, k: int) -> int:
    """Row-block size for the streamed kernel, or 0 if infeasible.

    Blocks are multiples of 128 so the in-kernel q_j segment reads stay
    lane-aligned; ~N ≤ 8k streams, beyond that callers fall back to the
    scan (or the sparse COO path, which is the right tool there).
    A block never exceeds the 128-aligned N — picking bn=512 for a
    128-node graph would pad the whole problem 4× for nothing."""
    n128 = -(-n // 128) * 128
    for bn in (512, 256, 128):
        if bn > n128:
            continue
        n_pad = -(-n // bn) * bn
        if _stream_bytes(bn, n_pad, k) <= _STREAM_VMEM_BUDGET:
            return bn
    return 0


def _lanczos_stream_kernel(s_ref, q0_ref, alpha_ref, beta_ref, q_ref,
                           p1_ref, p2_ref, w4_ref, wacc_ref, qfold_ref,
                           bprev_ref, *, k: int, bn: int, eps: float):
    """One (graph, step, row-block) program.

    s_ref [1,bn,N]: this row block of the symmetric operator.
    q0_ref [1,1,N]: start vector (the singleton sublane axis keeps the
    block legal for batch > 1 — a [1,N] block over a [B,N] array has a
    sublane dim of 1, which Mosaic only allows when B == 1). Outputs
    per graph (resident across the
    (K, NB) inner grid): alpha/beta [1,K,128] (scalar broadcast across
    lanes — lane-dynamic stores are unsupported, sublane-dynamic are),
    q/w4 [1,K,N], p1/p2 [1,K,K]. Scratch: wacc [1,N] matvec
    accumulator, qfold [NB,bn] the current q_j re-laid as sublane
    segments (so the per-block segment read is a sublane index),
    bprev [1,1] SMEM β carry.
    """
    j = pl.program_id(1)
    nbi = pl.program_id(2)
    nb_tot = pl.num_programs(2)

    @pl.when((j == 0) & (nbi == 0))
    def _init():
        q_ref[0] = jnp.zeros_like(q_ref[0])
        q_ref[0, 0, :] = q0_ref[0, 0]
        bprev_ref[0, 0] = 0.0

    @pl.when(nbi == 0)
    def _start_step():
        wacc_ref[:] = jnp.zeros_like(wacc_ref)
        for seg in range(nb_tot):  # static unroll: fold q_j to sublanes
            qfold_ref[seg, :] = q_ref[0, j, seg * bn:(seg + 1) * bn]

    # partial matvec over this row block (symmetry: w = qᵀS row-slab)
    q_seg = qfold_ref[nbi, :]  # [bn], dynamic sublane read
    wacc_ref[0, :] += jax.lax.dot_general(
        q_seg[None, :], s_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0]

    @pl.when(nbi == nb_tot - 1)
    def _finish_step():
        q_j = q_ref[0, j, :]  # [N]
        w = wacc_ref[0, :]
        alpha = jnp.sum(q_j * w)
        beta_prev = bprev_ref[0, 0]
        # carry quirk shared with the scan/molecular implementations:
        # q_prev entering step j IS q_j (see ops/lanczos.py adjoint
        # notes), so the β_prev·q_prev term folds into the q_j one.
        w = w - (alpha + beta_prev) * q_j
        qb = q_ref[0]  # [K, N]
        proj1 = jnp.sum(qb * w[None, :], axis=1)  # [K]
        w = w - jnp.sum(qb * proj1[:, None], axis=0)
        proj2 = jnp.sum(qb * w[None, :], axis=1)
        w = w - jnp.sum(qb * proj2[:, None], axis=0)
        beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w), eps * eps))
        valid = (beta > eps).astype(jnp.float32)
        lanes = jnp.ones((128,), jnp.float32)
        alpha_ref[0, j, :] = alpha * lanes
        beta_ref[0, j, :] = (beta * valid) * lanes
        p1_ref[0, j, :] = proj1
        p2_ref[0, j, :] = proj2
        w4_ref[0, j, :] = w
        bprev_ref[0, 0] = beta * valid

        @pl.when(j + 1 < k)
        def _():
            q_ref[0, j + 1, :] = valid * w / beta


def _lanczos_stream_call(s, mask, k, eps, bn, interpret):
    """Host wrapper for the streamed kernel; same residual contract as
    the molecular path."""
    b, n, _ = s.shape
    n_pad = -(-n // bn) * bn
    pad = n_pad - n
    if pad:
        s = jnp.pad(s.astype(jnp.float32), ((0, 0), (0, pad), (0, pad)))
        mask = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad)))
    nb = n_pad // bn

    alphas, betas, q, p1, p2, w4 = pl.pallas_call(
        partial(_lanczos_stream_kernel, k=k, bn=bn, eps=eps),
        grid=(b, k, nb),
        in_specs=[
            pl.BlockSpec((1, bn, n_pad), lambda bi, ki, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, 128), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 128), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n_pad), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n_pad), lambda bi, ki, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, k, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),
            pltpu.VMEM((nb, bn), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        s.astype(jnp.float32),
        lanczos_start_vector(mask.astype(jnp.float32), eps)[:, None, :],
    )
    return (
        alphas[:, :, 0],
        betas[:, :, 0],
        q[:, :, :n],
        p1,
        p2,
        w4[:, :, :n],
    )


@partial(jax.jit, static_argnames=("k", "eps", "interpret"))
def lanczos_tridiag_pallas_resid(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Batched tridiagonalization with adjoint residuals:
    s [B,N,N], mask [B,N] → (alphas [B,k], betas_full [B,k], q [B,k,N],
    p1 [B,k,k], p2 [B,k,k], w4 [B,k,N]).

    Dispatches between the whole-problem-in-VMEM molecular kernel and
    the HBM-streamed large-N kernel (`_lanczos_stream_call`); raises
    only when neither fits (then use the lax.scan implementation)."""
    b, n, _ = s.shape
    g_tile = _pick_tile(b, n, k)
    if g_tile == 0:
        bn = _pick_stream_block(n, k)
        if bn == 0:
            raise ValueError(
                f"Lanczos Pallas kernels infeasible for n={n}, k={k} "
                "(per-step state exceeds VMEM even streamed); use the "
                "lax.scan implementation "
                "(ops.lanczos.batched_lanczos_ritz / impl='scan')"
            )
        return _lanczos_stream_call(s, mask, k, eps, bn, interpret)
    pad = (-b) % g_tile
    if pad:
        s = jnp.concatenate([s, jnp.zeros((pad, n, n), s.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, n), mask.dtype)])
    bp = b + pad

    # graphs-on-lanes: ship the operator as [N, N, G] and q0 as [N, G]
    s_t = jnp.transpose(s.astype(jnp.float32), (1, 2, 0))
    q0_t = lanczos_start_vector(mask.astype(jnp.float32), eps).T

    alphas, betas, q, p1, p2, w4 = pl.pallas_call(
        partial(_lanczos_kernel, k=k, eps=eps),
        grid=(bp // g_tile,),
        in_specs=[
            pl.BlockSpec((n, n, g_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, g_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, g_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, g_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, g_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, g_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, g_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, g_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, n, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, n, bp), jnp.float32),
        ],
        interpret=interpret,
    )(s_t, q0_t)
    return (
        alphas.T[:b],
        betas.T[:b],
        jnp.transpose(q, (2, 0, 1))[:b],
        jnp.transpose(p1, (2, 0, 1))[:b],
        jnp.transpose(p2, (2, 0, 1))[:b],
        jnp.transpose(w4, (2, 0, 1))[:b],
    )


def lanczos_tridiag_pallas(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched tridiagonalization: s [B,N,N], mask [B,N] →
    (alphas [B,k], betas [B,k-1], q [B,k,N])."""
    alphas, betas_full, q, _, _, _ = lanczos_tridiag_pallas_resid(
        s, mask, k, eps, interpret
    )
    return alphas, betas_full[:, : k - 1], q


def _ritz_from_tridiag(alphas, betas, q):
    """(alphas [B,k], betas [B,k-1], q [B,k,N]) → (vals [B,k], vecs [B,N,k])."""
    t = jax.vmap(tridiag_matrix)(alphas, betas)
    vals, u = eigh_dispatch(t)
    vecs = jnp.einsum("bkn,bku->bnu", q, u, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return vals, vecs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tridiag_pallas_adj(
    s: jnp.ndarray, mask: jnp.ndarray, k: int, eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas-forward / adjoint-backward tridiagonalization.

    Forward runs the fused VMEM kernel; backward runs the hand-derived
    adjoint recursion (`ops.lanczos.lanczos_adjoint_bwd`) on the
    residuals the kernel already wrote — no scan replay, one transposed
    matvec per step plus one batched matmul for the operator cotangent.
    """
    alphas, betas_full, q, _, _, _ = lanczos_tridiag_pallas_resid(
        s, mask, k, eps, interpret
    )
    return alphas, betas_full[:, : k - 1], q


def _tridiag_adj_fwd(s, mask, k, eps, interpret):
    alphas, betas_full, q, p1, p2, w4 = lanczos_tridiag_pallas_resid(
        s, mask, k, eps, interpret
    )
    out = (alphas, betas_full[:, : k - 1], q)
    return out, (s, mask, alphas, betas_full, q, p1, p2, w4)


def _tridiag_adj_bwd(k, eps, interpret, res, bars):
    s, mask, alphas, betas_full, q, p1, p2, w4 = res
    bar_alphas, bar_betas, bar_q = bars
    bar_betas_full = jnp.concatenate(
        [bar_betas, jnp.zeros_like(bar_betas[:, :1])], axis=1
    )
    bar_s = jax.vmap(
        lambda *a: lanczos_adjoint_bwd(*a, eps=eps)
    )(s.astype(jnp.float32), alphas, betas_full, q, p1, p2, w4,
      bar_alphas, bar_betas_full, bar_q)
    return bar_s.astype(s.dtype), jnp.zeros_like(mask)


_tridiag_pallas_adj.defvjp(_tridiag_adj_fwd, _tridiag_adj_bwd)


def batched_lanczos_ritz_fast(
    s: jnp.ndarray, mask: jnp.ndarray, k: int, eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-forward / adjoint-backward batched Ritz pairs.

    Drop-in for `ops.lanczos.batched_lanczos_ritz`; the tridiagonal
    eigensolve and basis rotation sit outside the custom VJP and keep
    their own degeneracy-clamped gradients (`ops/eigh.py`).
    """
    return _ritz_from_tridiag(*_tridiag_pallas_adj(s, mask, k, eps, interpret))


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
        feasible = (
            _pick_tile(s.shape[0], s.shape[1], k) > 0
            or _pick_stream_block(s.shape[1], k) > 0
        )
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and feasible
            else "scan"
        )
    if impl == "pallas":
        return batched_lanczos_ritz_fast(s, mask, k, eps)
    return batched_lanczos_ritz(s, mask, k, eps)
