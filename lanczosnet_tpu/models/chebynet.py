"""ChebyNet — Chebyshev-polynomial spectral filters.

Parity with reference `model/chebynet.py` (SURVEY.md §2.5): per layer,
Chebyshev features ``T_0 h .. T_P h`` of each operator channel
(recurrence ``T_k = 2 S T_{k-1} − T_{k-2}``), concatenated and mixed by
one Dense. The recurrence is a `lax.scan` (ops/poly.py) — one compiled
while-loop of batched MXU matmuls instead of the reference's Python
loop of `bmm` launches.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, AttentionReadout, NodeEncoder, NodeHead
from lanczosnet_tpu.ops.poly import chebyshev_features


class ChebyNet(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    poly_order: int = 3
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations

    @classmethod
    def from_config(cls, cfg: dict) -> "ChebyNet":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            poly_order=cfg.get("poly_order", 3),
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
        cheb = jax.vmap(
            lambda op, x: chebyshev_features(op, x, self.poly_order),
            in_axes=(1, None),
            out_axes=1,
        )  # ops [B,E,N,N], x [B,N,F] -> [B,E,P+1,N,F]
        for li, dim in enumerate(self.hidden_dim):
            # the recurrence promotes to f32 against the f32 operator;
            # the feature stack is stored at activation dtype
            feats = cheb(batch.ops, h).astype(cdt)
            feats = jnp.moveaxis(feats, 3, 1).reshape(b, n, -1)
            h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(feats)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
