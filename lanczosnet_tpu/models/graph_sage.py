"""GraphSAGE — mean-aggregator variant on dense masked adjacency.

Parity with reference `model/graph_sage.py` (SURVEY.md §2.5): per layer,
mean over each edge type's neighbors (exact mean, recomputed from the
operator support so it is independent of the stack's normalization),
concatenated with the self state, Dense, ReLU, L2-normalize.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, edge_message_concat, flatten_feature_stack, AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.masked import l2_normalize


class GraphSAGE(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations

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
            dtype=compute_dtype(cfg.get("dtype")),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        cdt = self.dtype
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch).astype(cdt)
        b, n = batch.mask.shape
        mask = batch.mask.astype(cdt)
        # exact-mean operator forms in f32 regardless of activation dtype
        support = (batch.ops > 0).astype(jnp.float32)  # [B,E,N,N]
        support = support * batch.pair_mask()[:, None]
        deg = jnp.sum(support, axis=-1, keepdims=True)
        mean_op = support / jnp.maximum(deg, 1.0)
        for li, dim in enumerate(self.hidden_dim):
            neigh = edge_message_concat(mean_op, h).astype(cdt)
            h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(
                jnp.concatenate([h, neigh], axis=-1)
            )
            h = nn.relu(h)
            h = l2_normalize(h, axis=-1)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
