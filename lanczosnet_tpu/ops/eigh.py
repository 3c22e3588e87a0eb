"""Batched symmetric eigendecomposition with degeneracy-safe gradients.

The reference differentiates `torch.symeig` inside AdaLanczosNet's
forward (SURVEY.md §2.4). The standard eigh VJP contains
``1/(λ_j - λ_i)`` factors that blow up for (near-)degenerate
eigenvalues — which *always* occur here, because padded/broken-down
Lanczos directions contribute exact zero eigenvalues. ``safe_eigh``
clamps those factors (gradients between degenerate pairs are set to 0,
the standard Lorentzian-broadening-free guard), keeping AdaLanczosNet
trainable on padded batches.

The matrices are tiny (K×K with K≈20), so a vmapped dense ``eigh`` is
already optimal on TPU; there is nothing for a custom kernel to win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def safe_eigh(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric ``a [..., K, K]``.

    Returns ``(w [..., K], v [..., K, K])`` with ``a = v diag(w) v^T``,
    eigenvalues ascending. Differentiable with clamped degenerate terms.
    """
    sym = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    w, v = jnp.linalg.eigh(sym)
    # Plain tuple, not EighResult: the custom-VJP fwd rule's primal
    # output must match this function's pytree structure exactly.
    return w, v


def _fwd(a):
    w, v = safe_eigh(a)
    return (w, v), (w, v)


def _bwd(res, grads, eps: float = 1e-6):
    w, v = res
    gw, gv = grads
    if gw is None:
        gw = jnp.zeros_like(w)
    if gv is None:
        gv = jnp.zeros_like(v)
    vt = jnp.swapaxes(v, -1, -2)
    diff = w[..., None, :] - w[..., :, None]  # diff[i,j] = w_j - w_i
    # F_ij = 1/(w_j - w_i) off-diagonal, 0 where (near-)degenerate.
    safe = jnp.abs(diff) > eps
    f = jnp.where(safe, 1.0 / jnp.where(safe, diff, 1.0), 0.0)
    vtgv = jnp.einsum("...ij,...jk->...ik", vt, gv)
    eye = jnp.eye(w.shape[-1], dtype=w.dtype)
    core = f * vtgv + gw[..., :, None] * eye
    ga = jnp.einsum("...ij,...jk,...kl->...il", v, core, vt)
    ga = 0.5 * (ga + jnp.swapaxes(ga, -1, -2))
    return (ga,)


safe_eigh.defvjp(_fwd, _bwd)


# Fixed-sweep Jacobi is validated to ~1e-6 off-diagonal mass at
# 8 sweeps for K ≤ 32 (ops/jacobi.py docstring). Larger K needs more
# sweeps; past this bound "auto" falls back to safe_eigh rather than
# silently degrading Ritz accuracy.
_JACOBI_MAX_K = 64


def _jacobi_sweeps(k: int) -> int:
    """Sweep count for ~1e-6 convergence: 8 through K=32, then +1 sweep
    per additional 16 columns (Jacobi converges quadratically, so the
    growth is mild; validated in tests/test_jacobi.py)."""
    return 8 + max(0, (k - 32 + 15) // 16)


def eigh_dispatch(a: jnp.ndarray, impl: str = "auto"):
    """Select the symmetric eigensolver.

    "auto" uses the batched Jacobi sweeps (`ops/jacobi.py`) on TPU —
    XLA's QR-iteration eigh dominates the Ritz path there (measured
    ~17 ms of 19.5 ms at B=256, K=20) — and LAPACK-path `safe_eigh`
    elsewhere. Both share the same degeneracy-clamped VJP. Matrices
    wider than ``_JACOBI_MAX_K`` always take the safe_eigh path: the
    fixed sweep budget is only validated below that size.
    """
    k = int(a.shape[-1])
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "jacobi" if (on_tpu and k <= _JACOBI_MAX_K) else "lapack"
    if impl == "jacobi":
        if k > _JACOBI_MAX_K:
            raise ValueError(
                f"jacobi eigh requested for K={k} > {_JACOBI_MAX_K}; the "
                "fixed-sweep budget is not validated there — use "
                "impl='lapack' (safe_eigh)"
            )
        from lanczosnet_tpu.ops.jacobi import jacobi_eigh

        return jacobi_eigh(a, sweeps=_jacobi_sweeps(k))
    return safe_eigh(a)
