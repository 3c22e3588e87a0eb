"""Polynomial / diffusion graph-filter features (ChebyNet, DCNN, and
LanczosNet's short-diffusion scales).

The reference computes these as Python loops of `torch.bmm` inside each
model's forward (SURVEY.md §2.5). Here they are `lax.scan` recurrences:
static trip count, one fused XLA while-loop, no per-step kernel-launch
overhead, and the scan carries only ``[B, N, F]`` states so the MXU sees
a stream of large batched matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Static trip counts at or below this unroll to straight-line matmuls;
# larger ones keep the compact lax.scan form (compile-size guard).
_UNROLL_MAX = 8


def _bmm(op: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched [B,N,N] @ [B,N,F] on the MXU in fp32 accumulation."""
    return jax.lax.dot_general(
        op,
        x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def chebyshev_features(
    op: jnp.ndarray, x: jnp.ndarray, order: int
) -> jnp.ndarray:
    """Chebyshev polynomial features ``[T_0 x, T_1 x, ..., T_order x]``.

    ``T_0 = I``, ``T_1 = S``, ``T_k = 2 S T_{k-1} - T_{k-2}`` with
    ``S = op`` (assumed spectrally scaled into [-1, 1], which holds for
    symmetric-normalized adjacency). Returns ``[B, order+1, N, F]``.
    """
    if order < 1:
        return x[:, None]
    t0, t1 = x, _bmm(op, x)
    if order <= _UNROLL_MAX:
        # straight-line for small static orders: a nested while-loop
        # inside the (scanned) train step costs more in sequencer
        # overhead than the matmuls themselves (profiled r2).
        feats = [t0, t1]
        for _ in range(order - 1):
            feats.append(2.0 * _bmm(op, feats[-1]) - feats[-2])
        return jnp.stack(feats, axis=1)

    def step(carry, _):
        prev, cur = carry
        nxt = 2.0 * _bmm(op, cur) - prev
        return (cur, nxt), nxt

    # the scan carry must be dtype-stable: _bmm emits f32 (preferred
    # accumulation type), so promote the seed states once — with bf16
    # activations the carry would otherwise flip bf16->f32 and fail at
    # trace time
    t0, t1 = t0.astype(jnp.float32), t1.astype(jnp.float32)
    _, rest = jax.lax.scan(step, (t0, t1), None, length=order - 1)
    # rest: [order-1, B, N, F] -> [B, order-1, N, F]
    feats = [t0[:, None], t1[:, None]]
    if order > 1:
        feats.append(jnp.moveaxis(rest, 0, 1))
    return jnp.concatenate(feats, axis=1)


def diffusion_features(
    op: jnp.ndarray, x: jnp.ndarray, max_hop: int
) -> jnp.ndarray:
    """Diffusion (power) features ``[S x, S^2 x, ..., S^max_hop x]``.

    Returns ``[B, max_hop, N, F]``. Used by DCNN (with ``op`` a
    row-stochastic transition matrix) and by LanczosNet's short scales.
    """
    if max_hop <= _UNROLL_MAX:
        feats = [x]
        for _ in range(max_hop):
            feats.append(_bmm(op, feats[-1]))
        return jnp.stack(feats[1:], axis=1)

    def step(carry, _):
        nxt = _bmm(op, carry)
        return nxt, nxt

    # dtype-stable carry (see chebyshev_features): _bmm emits f32
    _, powers = jax.lax.scan(step, x.astype(jnp.float32), None, length=max_hop)
    return jnp.moveaxis(powers, 0, 1)


def diffusion_features_at(
    op: jnp.ndarray, x: jnp.ndarray, dists: tuple[int, ...]
) -> jnp.ndarray:
    """Powers ``S^t x`` gathered at the (static) hop distances ``dists``.

    Computes up to ``max(dists)`` sequentially and gathers — the hops in
    LanczosNet's ``short_diffusion_dist`` are small consecutive ints so
    recomputation tricks aren't worth it. Returns ``[B, len(dists), N, F]``.
    """
    if not dists:
        return jnp.zeros((x.shape[0], 0) + x.shape[1:], x.dtype)
    all_powers = diffusion_features(op, x, max(dists))
    idx = jnp.asarray([d - 1 for d in dists], dtype=jnp.int32)
    return jnp.take(all_powers, idx, axis=1)
