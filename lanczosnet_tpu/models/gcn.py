"""GCN — per-edge-type dense graph convolution.

Behavior parity with reference `model/gcn.py` (SURVEY.md §2.5):
per layer, propagate node states through every normalized operator
channel, concatenate with the self state, and mix with one Dense —
``h ← Dropout(ReLU(W [h ‖ {L_e h}_e]))`` — then gated-attention readout.
On TPU the per-edge-type propagation is a single einsum
``[B,E,N,N]×[B,N,F]`` that XLA maps onto the MXU in one batched matmul.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, edge_message_concat, flatten_feature_stack, AttentionReadout, NodeEncoder, NodeHead


class GCN(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations (base.compute_dtype)

    @classmethod
    def from_config(cls, cfg: dict) -> "GCN":
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
        for li, dim in enumerate(self.hidden_dim):
            # propagation accumulates f32 (preferred_element_type), the
            # result is stored at activation dtype
            msg = edge_message_concat(batch.ops, h).astype(cdt)
            h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(
                jnp.concatenate([h, msg], axis=-1)
            )
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
