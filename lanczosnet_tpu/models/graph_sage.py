"""GraphSAGE — mean-aggregator variant on dense masked adjacency.

Parity with reference `model/graph_sage.py` (SURVEY.md §2.5): per layer,
mean over each edge type's neighbors (exact mean, recomputed from the
operator support so it is independent of the stack's normalization),
concatenated with the self state, Dense, ReLU, L2-normalize.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import edge_message_concat, flatten_feature_stack, AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.masked import l2_normalize


class GraphSAGE(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)

    @classmethod
    def from_config(cls, cfg: dict) -> "GraphSAGE":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            output_hidden_dim=tuple(cfg.get("output_hidden_dim", ())),
            dropout=cfg.get("dropout", 0.0),
            task=cfg.get("task", "graph"),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch)
        b, n = batch.mask.shape
        support = (batch.ops > 0).astype(h.dtype)  # [B,E,N,N]
        support = support * batch.pair_mask()[:, None]
        deg = jnp.sum(support, axis=-1, keepdims=True)
        mean_op = support / jnp.maximum(deg, 1.0)
        for li, dim in enumerate(self.hidden_dim):
            neigh = edge_message_concat(mean_op, h)
            h = nn.Dense(dim, name=f"layer_{li}")(
                jnp.concatenate([h, neigh], axis=-1)
            )
            h = nn.relu(h)
            h = l2_normalize(h, axis=-1)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * batch.mask[..., None]
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
