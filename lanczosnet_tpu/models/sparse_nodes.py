"""Sparse full-graph node classifiers (single graph, COO operator).

Companions to the dense `task: node` models for graphs too large for a
dense ``[N, N]`` operator (ROADMAP.md #2, VERDICT round-1 #5):

- :class:`SparseGCN` — propagation is `ops.sparse.spmv`.
- :class:`SparseChebyNet` — Chebyshev recurrence
  ``T_k = 2·S·T_{k-1} − T_{k-2}`` with spmv matvecs (same polynomial
  semantics as the dense `ops/poly.py:chebyshev_features`).
- :class:`SparseGAT` — multi-head attention with the softmax taken
  over each node's incoming COO edges plus an implicit self-edge
  (`ops.sparse.segment_softmax_coo`), never materializing [N, N].
- :class:`SparseLanczosNet` — short scales via repeated spmv, long
  scales via the low-rank ``V f(D) Vᵀ`` reconstruction from Ritz pairs
  computed by `ops.sparse.sparse_lanczos_ritz` (precomputed once per
  graph, like the dense LanczosNet's data-time D, V).

All take ``(features [N, F], op: SparseOp)``-style inputs and return
``[N, C]`` logits; no padding/mask is needed — every node is real.
Every propagation/attention reduction goes through the ops/sparse.py
helpers, so when ``op.axis`` is set (edge-sharded inside a shard_map,
`parallel/mesh.py:shard_sparse_op`) the exact same model code runs
distributed with psum/pmax-completed reductions.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.models.base import MLP
from lanczosnet_tpu.ops.sparse import (
    SparseOp,
    attention_spmv,
    segment_softmax_coo,
    sparse_diffusion_features,
    spmv,
)


class SparseGCN(nn.Module):
    hidden_dim: Sequence[int]
    num_class: int
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x
        for li, dim in enumerate(self.hidden_dim):
            h = jnp.concatenate([h, spmv(op, h)], axis=-1)
            h = nn.relu(nn.Dense(dim, name=f"layer_{li}")(h))
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, name="head")(h)


class SparseChebyNet(nn.Module):
    """Chebyshev filters of the (spectrally scaled) operator, COO form.

    Mirrors dense `models/chebynet.py` at its single-operator endpoint:
    features ``[T_0 h, …, T_P h]`` per layer, ``T_0 = h``,
    ``T_1 = S h``, ``T_k = 2 S T_{k-1} − T_{k-2}`` — each matvec an
    edge-(sharded-)spmv.
    """

    hidden_dim: Sequence[int]
    num_class: int
    poly_order: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x
        for li, dim in enumerate(self.hidden_dim):
            feats = [h]
            if self.poly_order >= 1:
                feats.append(spmv(op, h))
            for _ in range(self.poly_order - 1):
                feats.append(2.0 * spmv(op, feats[-1]) - feats[-2])
            h = nn.relu(
                nn.Dense(dim, name=f"layer_{li}")(
                    jnp.concatenate(feats, axis=-1)
                )
            )
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, name="head")(h)


class SparseGAT(nn.Module):
    """Multi-head graph attention over COO edges.

    Dense `models/gat.py` semantics (additive attention, LeakyReLU,
    per-destination softmax incl. self) at sparse scale: logits live
    per edge, the softmax is a masked segment max/sum over each node's
    incoming edges plus an implicit self-edge, and aggregation is an
    attention-weighted spmv — O(E·H), never O(N²).
    """

    hidden_dim: Sequence[int]
    num_class: int
    num_head: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x
        for li, dim in enumerate(self.hidden_dim):
            head_dim = -(-dim // self.num_head)
            hp = nn.Dense(
                self.num_head * head_dim, use_bias=False, name=f"proj_{li}"
            )(h).reshape(h.shape[0], self.num_head, head_dim)  # [N, H, D]
            a_src = self.param(
                f"att_src_{li}", nn.initializers.glorot_uniform(),
                (self.num_head, head_dim),
            )
            a_dst = self.param(
                f"att_dst_{li}", nn.initializers.glorot_uniform(),
                (self.num_head, head_dim),
            )
            s_src = jnp.sum(hp * a_src[None], axis=-1)  # [N, H]
            s_dst = jnp.sum(hp * a_dst[None], axis=-1)  # [N, H]
            # edge (i <- j): destination=row (segment), source=col
            logits = nn.leaky_relu(
                s_dst[op.row] + s_src[op.col], self.negative_slope
            )  # [E, H]
            self_logits = nn.leaky_relu(
                s_dst + s_src, self.negative_slope
            )  # [N, H]
            p, denom, p_self = segment_softmax_coo(logits, op, self_logits)
            msg = attention_spmv(op, p, hp)  # [N, H, D]
            msg = msg + p_self[..., None] * hp  # implicit self-edge
            h = (msg / denom[..., None]).reshape(h.shape[0], -1)
            h = nn.elu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, name="head")(h)


class SparseLanczosNet(nn.Module):
    hidden_dim: Sequence[int]
    num_class: int
    short_diffusion_dist: Sequence[int] = (1, 2)
    long_diffusion_dist: Sequence[int] = (5, 10)
    filter_hidden_dim: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        op: SparseOp,
        ritz_val: jnp.ndarray,  # [K]
        ritz_vec: jnp.ndarray,  # [N, K]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = x
        for li, dim in enumerate(self.hidden_dim):
            parts = [h]
            if self.short_diffusion_dist:
                short = sparse_diffusion_features(
                    op, h, tuple(self.short_diffusion_dist)
                )  # [S, N, F]
                parts.extend(short)
            for t in self.long_diffusion_dist:
                feat = jnp.stack([ritz_val, ritz_val**t], axis=-1)  # [K, 2]
                f = MLP((self.filter_hidden_dim, 1),
                        name=f"filter_{li}_t{t}")(feat)[..., 0]  # [K]
                vtx = ritz_vec.T @ h  # [K, F]
                parts.append(ritz_vec @ (f[:, None] * vtx))
            h = nn.relu(
                nn.Dense(dim, name=f"layer_{li}")(
                    jnp.concatenate(parts, axis=-1)
                )
            )
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, name="head")(h)
