"""GAT — dense masked multi-head graph attention, per edge type.

Parity with reference `model/gat.py` (SURVEY.md §2.5): additive
attention scores over each edge type's neighborhood (plus self-loops),
LeakyReLU, softmax masked to the adjacency support, multi-head,
summed across edge types, heads concatenated. The dense-masked-softmax
formulation (no gather/scatter) is exactly the TPU-friendly shape: the
[B,H,N,N] score tensor lives in registers/VMEM between two batched
matmuls and XLA fuses the masking/softmax chain between them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.masked import masked_softmax


class GATLayer(nn.Module):
    out_dim: int  # per-head output features
    num_heads: int
    num_edge_channels: int
    leaky_slope: float = 0.2

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, ops: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        b, n, _ = h.shape
        eye = jnp.eye(n, dtype=h.dtype)
        outs = []
        for e in range(self.num_edge_channels):
            z = nn.Dense(self.num_heads * self.out_dim, use_bias=False, name=f"w_{e}")(h)
            z = z.reshape(b, n, self.num_heads, self.out_dim)
            a_src = nn.Dense(self.num_heads, use_bias=False, name=f"a_src_{e}")(h)
            a_dst = nn.Dense(self.num_heads, use_bias=False, name=f"a_dst_{e}")(h)
            # scores[b,h,i,j] = leaky(a_src_i + a_dst_j)
            scores = a_src.transpose(0, 2, 1)[:, :, :, None] + a_dst.transpose(
                0, 2, 1
            )[:, :, None, :]
            scores = nn.leaky_relu(scores, negative_slope=self.leaky_slope)
            support = ((ops[:, e] > 0) | (eye > 0)).astype(h.dtype)
            support = support * mask[:, :, None] * mask[:, None, :]
            att = masked_softmax(scores, support[:, None], axis=-1)  # [B,H,N,N]
            agg = jnp.einsum(
                "bhij,bjhf->bihf", att, z, preferred_element_type=jnp.float32
            )
            outs.append(agg)
        out = sum(outs).reshape(b, n, self.num_heads * self.out_dim)
        return out


class GAT(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    num_heads: int = 4
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)

    @classmethod
    def from_config(cls, cfg: dict) -> "GAT":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            num_heads=cfg.get("num_heads", 4),
            output_hidden_dim=tuple(cfg.get("output_hidden_dim", ())),
            dropout=cfg.get("dropout", 0.0),
            task=cfg.get("task", "graph"),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch)
        num_e = batch.num_ops
        for li, dim in enumerate(self.hidden_dim):
            per_head = max(dim // self.num_heads, 1)
            h = GATLayer(per_head, self.num_heads, num_e, name=f"layer_{li}")(
                h, batch.ops, batch.mask
            )
            h = nn.elu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * batch.mask[..., None]
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
