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

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.masked import masked_softmax


class GATLayer(nn.Module):
    out_dim: int  # per-head output features
    num_heads: int
    num_edge_channels: int
    leaky_slope: float = 0.2
    # activation dtype; scores/softmax/aggregation stay f32 for
    # stability, only the z projection and the layer output run bf16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, ops: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        b, n, _ = h.shape
        eye = jnp.eye(n, dtype=jnp.float32)
        outs = []
        for e in range(self.num_edge_channels):
            z = nn.Dense(self.num_heads * self.out_dim, use_bias=False, name=f"w_{e}", dtype=self.dtype)(h)
            z = z.reshape(b, n, self.num_heads, self.out_dim)
            a_src = nn.Dense(self.num_heads, use_bias=False, name=f"a_src_{e}", dtype=self.dtype)(h)
            a_dst = nn.Dense(self.num_heads, use_bias=False, name=f"a_dst_{e}", dtype=self.dtype)(h)
            # scores[b,h,i,j] = leaky(a_src_i + a_dst_j); softmax in f32
            scores = (
                a_src.transpose(0, 2, 1)[:, :, :, None]
                + a_dst.transpose(0, 2, 1)[:, :, None, :]
            ).astype(jnp.float32)
            scores = nn.leaky_relu(scores, negative_slope=self.leaky_slope)
            support = ((ops[:, e] > 0) | (eye > 0)).astype(jnp.float32)
            support = support * mask[:, :, None] * mask[:, None, :]
            att = masked_softmax(scores, support[:, None], axis=-1)  # [B,H,N,N]
            agg = jnp.einsum(
                "bhij,bjhf->bihf", att, z, preferred_element_type=jnp.float32
            )
            outs.append(agg)
        out = sum(outs).reshape(b, n, self.num_heads * self.out_dim)
        return out.astype(self.dtype)


class GAT(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    num_heads: int = 4
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations

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
            dtype=compute_dtype(cfg.get("dtype")),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        cdt = self.dtype
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch).astype(cdt)
        mask = batch.mask.astype(cdt)
        num_e = batch.num_ops
        for li, dim in enumerate(self.hidden_dim):
            per_head = max(dim // self.num_heads, 1)
            h = GATLayer(per_head, self.num_heads, num_e, name=f"layer_{li}", dtype=cdt)(
                h, batch.ops, batch.mask
            )
            h = nn.elu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
