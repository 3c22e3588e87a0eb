"""K-step Lanczos tridiagonalization with full reorthogonalization.

This is the spectral core of the framework, replacing two pieces of the
reference (SURVEY.md §2.3/§2.4/§2.6):

1. the *offline* per-graph scipy/numpy Lanczos in the data pipeline
   (`utils/data_helper.py`) that precomputes Ritz pairs (D, V) shipped
   with every LanczosNet batch, and
2. the *in-graph* PyTorch Lanczos loop in `model/ada_lanczos_net.py`
   (`_lanczos_layer`-style, K sequential eager steps) that
   AdaLanczosNet differentiates through.

Here both are the same function: a `lax.scan` over K steps of

    w = S q_j ;  α_j = q_j·w ;  w ← w − α_j q_j − β_{j−1} q_{j−1}
    w ← w − Q Qᵀ w   (twice — full reorthogonalization, CGS2)
    β_j = ‖w‖ ;  q_{j+1} = w / β_j   (ε-guarded; 0 on breakdown)

batched with `vmap`, so on TPU the whole K-step recursion compiles into
one XLA while-loop of large batched matmuls (the [B,N,N]×[B,N] matvec
and the [B,K,N] reorthogonalization projections both ride the MXU).
Gradients flow through the scan by ordinary reverse-mode autodiff; the
K×K tridiagonal eigensolve uses `safe_eigh` (degeneracy-clamped VJP).

Breakdown (β→0) is expected, not exceptional: padded graphs have rank
< K, disconnected graphs split the Krylov space. On breakdown the
remaining basis vectors are exact zeros, the tridiagonal gets zero
rows/cols, and the corresponding Ritz vectors vanish — so the low-rank
reconstruction V·f(D)·Vᵀ is unaffected by padding. Property-tested in
tests/test_lanczos.py against dense eigh and scipy.

A Pallas fused-kernel implementation of the same contract lives in
ops/lanczos_pallas.py; this scan version is the always-correct
reference it is A/B-tested against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops.eigh import eigh_dispatch


def _norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x), eps * eps))


def _start_raw(mask: jnp.ndarray, index_offset) -> jnp.ndarray:
    """Unnormalized quasi-random start vector over *global* node ids.

    ``index_offset`` shifts the node-index argument of the sinusoids —
    a node-sharded caller passes its block start so every shard
    evaluates the same global vector it would see unsharded.
    """
    n = mask.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32) + index_offset
    v = 1.0 + jnp.sin(1.9 * i + 0.7) + 0.5 * jnp.cos(0.37 * i * i + 0.3)
    return v * mask


def lanczos_start_vector(mask: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Deterministic *generic* start vector ``q0`` for the recursion.

    A constant start vector is an eigenvector of every regular graph's
    normalized operator, which makes Lanczos break down after one step
    and silently collapses the K Ritz pairs to rank 1 (a cycle/ring
    molecule would lose all long-scale structure). Instead use a fixed
    quasi-random masked vector — a sum of incommensurate sinusoids of
    the node index — which has generic overlap with every eigenvector
    in practice while staying bit-reproducible across runs and across
    the scan/Pallas implementations (both call this).

    mask ``[..., N]`` → unit-norm ``q0 [..., N]`` supported on mask.
    """
    v = _start_raw(mask, 0)
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps * eps)
    )
    return v / norm


def lanczos_tridiag_matvec(
    matvec,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
    axis: str | None = None,
    index_offset=0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-step Lanczos driven by an operator *callback* — the operator
    never needs to exist as a dense matrix, which is what makes the
    sparse full-graph path (`ops/sparse.py`) reuse this exact recursion.

    Args:
      matvec: ``[N] -> [N]`` symmetric linear operator application.
      mask: ``[N]`` node mask (1 real / 0 pad).
      k: number of Lanczos steps (static).
      eps: breakdown threshold on β.
      axis: mesh-axis name when the node axis is *sharded* across
        devices (`ops/sparse.py` node-sharded mode): every node-axis
        inner product (α, β, the CGS2 projections, the start-vector
        norm) finishes with a ``psum`` so each shard runs the exact
        global recursion on its rows.
      index_offset: this shard's global node-id offset (so the
        quasi-random start vector is the same global vector unsharded
        and sharded).

    Returns: same contract as :func:`lanczos_tridiag` (``q`` holding
    this shard's rows of the basis when ``axis`` is set).
    """
    n = mask.shape[0]
    dtype = mask.dtype

    def _psum(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    q0 = _start_raw(mask, index_offset).astype(dtype)
    q0 = q0 / jnp.sqrt(jnp.maximum(_psum(jnp.sum(q0 * q0)), eps * eps))
    q_buf = jnp.zeros((k, n), dtype).at[0].set(q0)

    def step(carry, j):
        q_buf, beta_prev, q_prev = carry
        q_j = q_buf[j]
        w = matvec(q_j)
        alpha = _psum(jnp.dot(q_j, w))
        w = w - alpha * q_j - beta_prev * q_prev
        # Full reorthogonalization, two classical Gram-Schmidt passes.
        # Rows of q_buf beyond j are zero, so projecting against the
        # whole fixed-shape buffer is both correct and TPU-friendly.
        for _ in range(2):
            w = w - q_buf.T @ _psum(q_buf @ w)
        beta = jnp.sqrt(jnp.maximum(_psum(jnp.sum(w * w)), eps * eps))
        valid = (beta > eps).astype(dtype)
        q_next = valid * w / beta
        q_buf = jax.lax.cond(
            j + 1 < k,
            lambda b: b.at[j + 1].set(q_next),
            lambda b: b,
            q_buf,
        )
        return (q_buf, beta * valid, q_next), (alpha, beta * valid)

    # The recursion lives or dies on orthogonality — bf16 MXU inputs
    # (the TPU matmul default) visibly decohere the basis and drift
    # from the f32 Pallas kernel, so force full f32 contractions.
    q_prev0 = jnp.zeros((n,), dtype)
    if axis is not None:
        # Under shard_map the q vectors are device-varying row blocks;
        # the initial zero carry must carry the same vma type or the
        # scan rejects the carry as type-changing.
        q_prev0 = jax.lax.pcast(q_prev0, (axis,), to="varying")
    with jax.default_matmul_precision("float32"):
        (q_buf, _, _), (alphas, betas) = jax.lax.scan(
            step, (q_buf, jnp.zeros((), dtype), q_prev0),
            jnp.arange(k),
            unroll=_collective_safe_unroll(axis, k),
        )
    return alphas, betas[:-1], q_buf


def _collective_safe_unroll(axis: str | None, length: int) -> int:
    """Full unroll for loops whose BODY contains collectives, on CPU.

    XLA:CPU's in-process collectives rendezvous on (run_id, op_id); a
    multi-trip `while` re-executes the SAME collective instruction each
    iteration, so every trip reuses one rendezvous key. Under thread
    starvation (the forced 8-virtual-device test mesh on few cores) a
    device straggling in iteration i's rendezvous gets joined by peers
    already at iteration i+1 — 9 participants for an 8-way collective,
    observed as a hard `use_count 9 vs 8` CHECK or, worse, silently
    mixed buffers (the r2/r3 order-dependent NaN in the node-sharded
    AdaLanczosNet test: same executable, same inputs, NaN once then the
    exact correct loss on retry — scripts/repro_ada_nan.py reproduces
    it on demand). Fully unrolling gives every collective its own HLO
    instruction, so no two in-flight rendezvous share a key. TPU (and
    unsharded) programs are untouched.
    """
    if axis is not None and jax.default_backend() == "cpu":
        return max(int(length), 1)
    return 1


@partial(jax.jit, static_argnames=("k",))
def lanczos_tridiag(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-step Lanczos on one dense symmetric operator.

    Args:
      s: ``[N, N]`` symmetric operator with zeroed padded rows/cols.
      mask: ``[N]`` node mask (1 real / 0 pad).
      k: number of Lanczos steps (static).
      eps: breakdown threshold on β.

    Returns:
      alphas ``[k]``, betas ``[k-1]`` (off-diagonal), q ``[k, N]``
      (orthonormal Lanczos vectors as rows; zero rows after breakdown).
    """
    return lanczos_tridiag_matvec(
        lambda v: s @ v, mask.astype(s.dtype), k, eps
    )


def tridiag_matrix(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Assemble the symmetric tridiagonal ``T [k, k]`` from diagonals."""
    k = alphas.shape[0]
    t = jnp.zeros((k, k), alphas.dtype)
    t = t + jnp.diag(alphas)
    if k > 1:
        t = t + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    return t


def lanczos_ritz(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ritz pairs of one operator: ``(ritz_val [k], ritz_vec [N, k])``.

    ``s ≈ V diag(D) V^T`` restricted to the K-dim Krylov space; padded /
    post-breakdown directions yield (0, ~0-vector) pairs.
    """
    alphas, betas, q = lanczos_tridiag(s, mask, k, eps)
    t = tridiag_matrix(alphas, betas)
    ritz_val, u = eigh_dispatch(t)
    with jax.default_matmul_precision("float32"):
        ritz_vec = q.T @ u  # [N, k]
    return ritz_val, ritz_vec


def batched_lanczos_ritz(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Ritz pairs: ``s [B,N,N]``, ``mask [B,N]`` →
    ``(ritz_val [B,k], ritz_vec [B,N,k])``."""
    return jax.vmap(lambda si, mi: lanczos_ritz(si, mi, k, eps))(s, mask)


# ---------------------------------------------------------------------------
# Adjoint-mode gradients (hand-derived VJP of the recursion)
#
# Plain reverse-mode through the scan above is correct but pays for the
# recursion twice when composed with a non-autodiff forward (the Pallas
# kernel re-ran the whole scan inside its backward), and its backward
# accumulates ``bar_S`` as K sequential rank-1 updates of an [N, N]
# array. The adjoint implementation below:
#
#   * saves tiny residuals in the forward — the CGS projection
#     coefficients p1, p2 [K, K] and the pre-normalization vectors
#     w4 [K, N] — so the backward never replays a matvec of the forward;
#   * runs the exact reverse recursion with ONE transposed matvec per
#     step (propagating the basis cotangent), and
#   * defers the operator cotangent to a single [N,K]x[K,N] matmul
#     ``bar_S = BWᵀ Q`` at the end (MXU-friendly instead of K rank-1
#     passes over N² memory).
#
# Breakdown steps (β clamped at ε, validity gate 0) receive exactly the
# autodiff gradient: the clamp's derivative is 0 there, so the whole
# w-chain cotangent vanishes and only the α path (which never gates)
# propagates. Verified against reverse-mode of the scan and finite
# differences in tests/test_lanczos_adjoint.py, including padded and
# breakdown cases.
# ---------------------------------------------------------------------------


def _lanczos_fwd_resid(s, mask, k: int, eps: float):
    """Forward recursion emitting adjoint residuals.

    Identical math to :func:`lanczos_tridiag_matvec` (kept in lockstep;
    the two CGS passes are unrolled so their projection coefficients can
    be saved). Returns ``(alphas [k], betas_full [k], q [k,N],
    p1 [k,k], p2 [k,k], w4 [k,N])`` with betas_full validity-masked.
    """
    n = mask.shape[-1]
    dtype = s.dtype
    q0 = lanczos_start_vector(mask, eps).astype(dtype)
    q_buf = jnp.zeros((k, n), dtype).at[0].set(q0)

    def step(carry, j):
        q_buf, beta_prev, q_prev = carry
        q_j = q_buf[j]
        w = s @ q_j
        alpha = jnp.dot(q_j, w)
        w = w - alpha * q_j - beta_prev * q_prev
        p1 = q_buf @ w
        w = w - q_buf.T @ p1
        p2 = q_buf @ w
        w = w - q_buf.T @ p2
        w4 = w
        beta = _norm(w, eps)
        valid = (beta > eps).astype(dtype)
        q_next = valid * w / beta
        q_buf = jax.lax.cond(
            j + 1 < k, lambda b: b.at[j + 1].set(q_next), lambda b: b, q_buf
        )
        return (q_buf, beta * valid, q_next), (alpha, beta * valid, p1, p2, w4)

    with jax.default_matmul_precision("float32"):
        (q_buf, _, _), (alphas, betas_full, p1, p2, w4) = jax.lax.scan(
            step, (q_buf, jnp.zeros((), dtype), jnp.zeros((n,), dtype)),
            jnp.arange(k),
        )
    return alphas, betas_full, q_buf, p1, p2, w4


def lanczos_adjoint_bwd(
    s, alphas, betas_full, q, p1, p2, w4,
    bar_alphas, bar_betas_full, bar_q, eps: float,
):
    """Reverse recursion: cotangents of (alphas, betas_full, q) → bar_s.

    All per-step primal values are reconstructed from the residuals
    (w3 = w4 + Qᵀp2, w2 = w3 + Qᵀp1, w1 = w2 + αq_j + βq_prev), so no
    forward matvec is replayed. Single-graph; `vmap` for batches.
    """
    k, n = q.shape
    dtype = s.dtype
    s_t = s.T
    rows = jnp.arange(k)
    beta_prevs = jnp.concatenate([jnp.zeros((1,), dtype), betas_full[:-1]])
    # The forward's carry quirk: ``q_prev`` entering step j is the
    # PREVIOUS step's q_next — which is q_buf[j] itself, not q_{j-1}
    # (harmless under CGS2: the β·q_prev subtraction is redundant with
    # full reorthogonalization; the torch parity twin and the Pallas
    # kernel share the same convention). The adjoint must reconstruct
    # the computation actually performed, so q_prev_j = q[j]; at j=0
    # β_prev = 0 kills the term either way.
    q_prevs = q

    def step(carry, xs):
        bar_qbuf, bar_beta_c, bar_qprev_c = carry
        (j, alpha, beta_out, beta_prev, q_j, q_prev, p1_j, p2_j, w4_j,
         bar_alpha_out, bar_beta_out_j) = xs
        valid = (beta_out > 0).astype(dtype)
        beta = jnp.where(beta_out > 0, beta_out, eps)
        rowmask = (rows <= j).astype(dtype)[:, None]
        qmat = q * rowmask  # basis state during forward step j
        # primal reconstruction (exact, incl. breakdown steps)
        w3 = w4_j + qmat.T @ p2_j
        w2 = w3 + qmat.T @ p1_j
        w1 = w2 + alpha * q_j + beta_prev * q_prev
        # cotangents flowing into this step's outputs
        in_range = (j + 1 < k).astype(dtype)
        bar_qnext = bar_qprev_c + in_range * bar_qbuf[jnp.minimum(j + 1, k - 1)]
        bar_beta_out = bar_beta_out_j + bar_beta_c
        # q_next = valid*w4/β ;  β = sqrt(max(w4·w4, ε²)) ;  out = valid*β
        bar_beta_raw = valid * (
            bar_beta_out - jnp.dot(w4_j, bar_qnext) / (beta * beta)
        )
        bar_w4 = valid * (bar_qnext / beta + bar_beta_raw * w4_j / beta)
        # CGS pass 2:  w4 = w3 − Qᵀp2,  p2 = Q w3
        bar_p2 = -(qmat @ bar_w4)
        bar_w3 = bar_w4 + qmat.T @ bar_p2
        bar_qmat = jnp.outer(bar_p2, w3) - jnp.outer(p2_j, bar_w4)
        # CGS pass 1:  w3 = w2 − Qᵀp1,  p1 = Q w2
        bar_p1 = -(qmat @ bar_w3)
        bar_w2 = bar_w3 + qmat.T @ bar_p1
        bar_qmat = bar_qmat + jnp.outer(bar_p1, w2) - jnp.outer(p1_j, bar_w3)
        # w2 = w1 − α q_j − β_prev q_prev
        bar_w1 = bar_w2
        bar_alpha = bar_alpha_out - jnp.dot(q_j, bar_w2)
        bar_qj = -alpha * bar_w2
        bar_beta_c_next = -jnp.dot(q_prev, bar_w2)
        bar_qprev_c_next = -beta_prev * bar_w2
        # α = q_j · w1
        bar_qj = bar_qj + bar_alpha * w1
        bar_w1 = bar_w1 + bar_alpha * q_j
        # w1 = S q_j  → basis cotangent now; bar_S deferred to one matmul
        bar_qj = bar_qj + s_t @ bar_w1
        # fold reads back into the basis cotangent buffer
        bar_qbuf = bar_qbuf * (rows != j + 1).astype(dtype)[:, None]
        bar_qbuf = bar_qbuf + bar_qmat * rowmask
        bar_qbuf = bar_qbuf + (rows == j).astype(dtype)[:, None] * bar_qj[None, :]
        return (bar_qbuf, bar_beta_c_next, bar_qprev_c_next), bar_w1

    xs = (
        rows, alphas, betas_full, beta_prevs, q, q_prevs, p1, p2, w4,
        bar_alphas, bar_betas_full,
    )
    carry0 = (bar_q, jnp.zeros((), dtype), jnp.zeros((n,), dtype))
    with jax.default_matmul_precision("float32"):
        _, bar_w1_stack = jax.lax.scan(step, carry0, xs, reverse=True)
        return bar_w1_stack.T @ q  # Σ_j outer(bar_w1_j, q_j)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lanczos_tridiag_adjoint(s, mask, k: int, eps: float = 1e-6):
    """`lanczos_tridiag` with the hand-derived adjoint backward.

    Same contract and (bitwise-identical forward) values; the backward
    costs one transposed matvec per step plus one matmul instead of a
    full re-linearized forward+backward sweep.
    """
    alphas, betas_full, q, _, _, _ = _lanczos_fwd_resid(s, mask.astype(s.dtype), k, eps)
    return alphas, betas_full[: k - 1], q


def _adjoint_fwd(s, mask, k, eps):
    alphas, betas_full, q, p1, p2, w4 = _lanczos_fwd_resid(
        s, mask.astype(s.dtype), k, eps
    )
    out = (alphas, betas_full[: k - 1], q)
    return out, (s, mask, alphas, betas_full, q, p1, p2, w4)


def _adjoint_bwd(k, eps, res, bars):
    s, mask, alphas, betas_full, q, p1, p2, w4 = res
    bar_alphas, bar_betas, bar_q = bars
    bar_betas_full = jnp.concatenate(
        [bar_betas, jnp.zeros((1,), bar_betas.dtype)]
    )
    bar_s = lanczos_adjoint_bwd(
        s, alphas, betas_full, q, p1, p2, w4,
        bar_alphas, bar_betas_full, bar_q, eps,
    )
    return bar_s, jnp.zeros_like(mask)


lanczos_tridiag_adjoint.defvjp(_adjoint_fwd, _adjoint_bwd)


def batched_lanczos_ritz_adjoint(
    s: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`batched_lanczos_ritz` with the adjoint recursion backward (the
    tridiagonal eigensolve keeps its own degeneracy-clamped VJP)."""

    def one(si, mi):
        alphas, betas, q = lanczos_tridiag_adjoint(si, mi, k, eps)
        t = tridiag_matrix(alphas, betas)
        ritz_val, u = eigh_dispatch(t)
        with jax.default_matmul_precision("float32"):
            return ritz_val, q.T @ u

    return jax.vmap(one)(s, mask)
