"""Sparse full-graph node classifiers (single graph, COO operator).

Companions to the dense `task: node` models for graphs too large for a
dense ``[N, N]`` operator (ROADMAP.md #2). Two members mirroring the
dense family's endpoints:

- :class:`SparseGCN` — propagation is `ops.sparse.spmv`.
- :class:`SparseLanczosNet` — short scales via repeated spmv, long
  scales via the low-rank ``V f(D) Vᵀ`` reconstruction from Ritz pairs
  computed by `ops.sparse.sparse_lanczos_ritz` (precomputed once per
  graph, like the dense LanczosNet's data-time D, V).

Both take ``(features [N, F], op: SparseOp)``-style inputs and return
``[N, C]`` logits; no padding/mask is needed — every node is real.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.models.base import MLP
from lanczosnet_tpu.ops.sparse import SparseOp, sparse_diffusion_features, spmv


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
