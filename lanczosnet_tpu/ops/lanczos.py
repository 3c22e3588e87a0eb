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
    n = mask.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    v = 1.0 + jnp.sin(1.9 * i + 0.7) + 0.5 * jnp.cos(0.37 * i * i + 0.3)
    v = v * mask
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps * eps)
    )
    return v / norm


def lanczos_tridiag_matvec(
    matvec,
    mask: jnp.ndarray,
    k: int,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-step Lanczos driven by an operator *callback* — the operator
    never needs to exist as a dense matrix, which is what makes the
    sparse full-graph path (`ops/sparse.py`) reuse this exact recursion.

    Args:
      matvec: ``[N] -> [N]`` symmetric linear operator application.
      mask: ``[N]`` node mask (1 real / 0 pad).
      k: number of Lanczos steps (static).
      eps: breakdown threshold on β.

    Returns: same contract as :func:`lanczos_tridiag`.
    """
    n = mask.shape[0]
    dtype = mask.dtype
    q0 = lanczos_start_vector(mask, eps).astype(dtype)
    q_buf = jnp.zeros((k, n), dtype).at[0].set(q0)

    def step(carry, j):
        q_buf, beta_prev, q_prev = carry
        q_j = q_buf[j]
        w = matvec(q_j)
        alpha = jnp.dot(q_j, w)
        w = w - alpha * q_j - beta_prev * q_prev
        # Full reorthogonalization, two classical Gram-Schmidt passes.
        # Rows of q_buf beyond j are zero, so projecting against the
        # whole fixed-shape buffer is both correct and TPU-friendly.
        for _ in range(2):
            w = w - q_buf.T @ (q_buf @ w)
        beta = _norm(w, eps)
        valid = (beta > eps).astype(dtype)
        q_next = valid * w / beta
        q_buf = jax.lax.cond(
            j + 1 < k,
            lambda b: b.at[j + 1].set(q_next),
            lambda b: b,
            q_buf,
        )
        return (q_buf, beta * valid, q_next), (alpha, beta * valid)

    (q_buf, _, _), (alphas, betas) = jax.lax.scan(
        step, (q_buf, jnp.zeros((), dtype), jnp.zeros((n,), dtype)), jnp.arange(k)
    )
    return alphas, betas[:-1], q_buf


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
