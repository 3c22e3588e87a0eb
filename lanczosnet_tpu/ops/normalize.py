"""Graph-operator construction: normalized adjacency / transition stacks.

Replaces the offline numpy normalization in the reference's data helper
(lrjconan/LanczosNetwork `utils/data_helper.py`, SURVEY.md §2.2): the
reference precomputes `D^{-1/2} A D^{-1/2}` per edge type on the host;
here the same math is a pure jittable function usable on host (numpy in,
via jnp on CPU) or fused into the forward (AdaLanczosNet's learned
kernel path).

All functions are mask-aware and zero-degree-safe: padded rows/columns
come out exactly zero so downstream matmuls never leak padding.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_adj(adj: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows/cols. adj [..., N, N], mask broadcastable [..., N]."""
    return adj * mask[..., :, None] * mask[..., None, :]


def sym_normalize(
    adj: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Symmetric normalization ``D^{-1/2} A D^{-1/2}`` with zero-degree guard.

    adj: ``[..., N, N]`` nonnegative; mask: ``[..., N]``.
    """
    a = _masked_adj(adj, mask)
    deg = jnp.sum(a, axis=-1)
    inv_sqrt = jnp.where(deg > eps, 1.0 / jnp.sqrt(jnp.maximum(deg, eps)), 0.0)
    return a * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]


def row_normalize(
    adj: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Row-stochastic transition matrix ``D^{-1} A`` (DCNN's diffusion op)."""
    a = _masked_adj(adj, mask)
    deg = jnp.sum(a, axis=-1)
    inv = jnp.where(deg > eps, 1.0 / jnp.maximum(deg, eps), 0.0)
    return a * inv[..., :, None]


def build_operator_stack(
    adj: jnp.ndarray,
    mask: jnp.ndarray,
    kind: str = "sym",
    add_self_loop: bool = False,
) -> jnp.ndarray:
    """Build the ``[B, E+1, N, N]`` operator stack from raw per-edge-type
    adjacency ``[B, E, N, N]``.

    Channel 0 is the normalized operator of the merged (all-edge-type)
    graph; channels ``1..E`` are the per-edge-type normalized operators.
    ``kind`` selects ``sym`` (``D^{-1/2} A D^{-1/2}``) or ``row``
    (``D^{-1} A``) normalization. ``add_self_loop`` adds I (masked)
    before normalizing, GCN-renormalization-trick style.
    """
    b, e, n, _ = adj.shape
    full = jnp.sum(adj, axis=1)  # [B, N, N]
    stacked = jnp.concatenate([full[:, None], adj], axis=1)  # [B, E+1, N, N]
    if add_self_loop:
        eye = jnp.eye(n, dtype=adj.dtype) * mask[:, None, :, None] * mask[:, None, None, :]
        stacked = stacked + eye
    norm = sym_normalize if kind == "sym" else row_normalize
    return norm(stacked, mask[:, None, :])
