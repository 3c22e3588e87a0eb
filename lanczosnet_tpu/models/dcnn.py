"""DCNN — diffusion-convolutional features over transition-matrix powers.

Parity with reference `model/dcnn.py` (SURVEY.md §2.5): hop-wise
diffusion features ``P^h X`` up to ``max_hop`` per operator channel
(``P`` row-stochastic — use ``operator_kind: row`` in the dataset
config), mixed per layer by one Dense. Powers come from the
`lax.scan` in ops/poly.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.poly import diffusion_features


class DCNN(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    max_hop: int = 3
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations

    @classmethod
    def from_config(cls, cfg: dict) -> "DCNN":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            max_hop=cfg.get("max_hop", 3),
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
        diff = jax.vmap(
            lambda op, x: diffusion_features(op, x, self.max_hop),
            in_axes=(1, None),
            out_axes=1,
        )  # -> [B, E, H, N, F]
        for li, dim in enumerate(self.hidden_dim):
            feats = diff(batch.ops, h).astype(cdt)
            feats = jnp.moveaxis(feats, 3, 1).reshape(b, n, -1)
            h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(
                jnp.concatenate([h, feats], axis=-1)
            )
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
