"""GPNN — graph partition neural network.

Parity with reference `model/gpnn.py` + `utils/spectral_graph_partition.py`
(SURVEY.md §2.5): each graph is partitioned into clusters (assignment
computed host-side in the data pipeline, `data/partition.py`, and
shipped as ``batch.cluster``); propagation alternates between
*intra-cluster* steps (operator masked to same-cluster pairs) and
*cut-graph* steps (operator masked to cross-cluster pairs).

TPU-first formulation: instead of the reference's per-subgraph
scatter/gather schedule, the partition is two ``[B,N,N]`` boolean masks
multiplied into the dense operator stack — the alternation is just two
masked einsums, shapes never change, everything stays one XLA program.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import edge_message_concat, flatten_feature_stack, AttentionReadout, NodeEncoder, NodeHead


class GPNN(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    num_prop: int = 2  # intra/inter alternations per layer
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)

    @classmethod
    def from_config(cls, cfg: dict) -> "GPNN":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            num_prop=cfg.get("num_prop", 2),
            output_hidden_dim=tuple(cfg.get("output_hidden_dim", ())),
            dropout=cfg.get("dropout", 0.0),
            task=cfg.get("task", "graph"),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch)
        b, n = batch.mask.shape
        if batch.cluster is None:
            cluster = jnp.zeros((b, n), jnp.int32)  # one big cluster
        else:
            cluster = batch.cluster
        same = (cluster[:, :, None] == cluster[:, None, :]).astype(h.dtype)
        same = same * batch.pair_mask()
        intra_ops = batch.ops * same[:, None]
        inter_ops = batch.ops * (batch.pair_mask() - same)[:, None]

        def propagate(x, ops, name):
            return jnp.concatenate([x, edge_message_concat(ops, x)], axis=-1)

        for li, dim in enumerate(self.hidden_dim):
            for p in range(self.num_prop):
                z = propagate(h, intra_ops, f"intra_{li}_{p}")
                h = nn.relu(nn.Dense(dim, name=f"intra_{li}_{p}")(z))
                z = propagate(h, inter_ops, f"inter_{li}_{p}")
                h = nn.relu(nn.Dense(dim, name=f"inter_{li}_{p}")(z))
                h = h * batch.mask[..., None]
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
