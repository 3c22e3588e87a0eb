"""GPNN — graph partition neural network.

Parity with reference `model/gpnn.py` + `utils/spectral_graph_partition.py`
(SURVEY.md §2.5): each graph is partitioned into clusters (assignment
computed host-side in the data pipeline, `data/partition.py`, and
shipped as ``batch.cluster``); propagation follows an explicit
*schedule* alternating between

- **intra-cluster steps** — the operator masked to same-cluster pairs;
  every node updates from its cluster neighbours, and
- **cut-graph steps** — a distinct operator over the *cut graph*: only
  the edges crossing partitions, restricted to the *boundary node set*
  (nodes incident to at least one cut edge). Non-boundary nodes pass
  through a cut step unchanged — the cut graph is its own node
  set/operator, exactly the reference's subgraph/cut-graph split, not
  just a masked variant of the full propagation.

The schedule is configurable like the reference's
(``num_prop`` repetitions of ``num_intra_prop`` intra steps followed by
``num_cut_prop`` cut steps, per layer).

TPU-first formulation: instead of the reference's per-subgraph
scatter/gather schedule, the partition is two ``[B,N,N]`` boolean masks
multiplied into the dense operator stack and a ``[B,N]`` boundary mask
gating the cut update — the schedule is a static Python loop of masked
einsums, shapes never change, everything stays one XLA program.

Provably needs the cut step to move information across partitions:
tests/test_gpnn_schedule.py checks the Jacobian across a 2-partition
line graph is exactly zero with ``num_cut_prop: 0`` and nonzero with
the default schedule.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import (
    AttentionReadout,
    NodeEncoder,
    NodeHead,
    compute_dtype,
    edge_message_concat,
)


class GPNN(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    num_prop: int = 2  # schedule repetitions per layer
    num_intra_prop: int = 1  # intra-cluster steps per repetition
    num_cut_prop: int = 1  # cut-graph steps per repetition
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 layer activations

    @classmethod
    def from_config(cls, cfg: dict) -> "GPNN":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            num_prop=cfg.get("num_prop", 2),
            num_intra_prop=cfg.get("num_intra_prop", 1),
            num_cut_prop=cfg.get("num_cut_prop", 1),
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
        if batch.cluster is None:
            cluster = jnp.zeros((b, n), jnp.int32)  # one big cluster
        else:
            cluster = batch.cluster
        # partition masks / operators form in f32 (exact 0/1 structure)
        same = (cluster[:, :, None] == cluster[:, None, :]).astype(jnp.float32)
        same = same * batch.pair_mask()
        cross = batch.pair_mask() - same
        intra_ops = batch.ops * same[:, None]
        cut_ops = batch.ops * cross[:, None]
        # the cut graph's node set: nodes incident to >=1 cut edge
        # (structure lives in operator channel 0)
        boundary = (jnp.sum(cut_ops[:, 0] != 0.0, axis=-1) > 0).astype(jnp.float32)
        boundary = (boundary * batch.mask)[..., None].astype(cdt)  # [B, N, 1]

        for li, dim in enumerate(self.hidden_dim):
            for p in range(self.num_prop):
                for i in range(self.num_intra_prop):
                    z = jnp.concatenate(
                        [h, edge_message_concat(intra_ops, h).astype(cdt)],
                        axis=-1,
                    )
                    h = nn.relu(
                        nn.Dense(dim, name=f"intra_{li}_{p}_{i}", dtype=cdt)(z)
                    )
                    h = h * mask[..., None]
                for c in range(self.num_cut_prop):
                    z = jnp.concatenate(
                        [h, edge_message_concat(cut_ops, h).astype(cdt)],
                        axis=-1,
                    )
                    upd = nn.relu(
                        nn.Dense(dim, name=f"cut_{li}_{p}_{c}", dtype=cdt)(z)
                    )
                    # only the cut graph's own nodes update; interior
                    # nodes pass through untouched (needs matching
                    # width — project once if the layer width changed)
                    if h.shape[-1] != dim:
                        h = nn.Dense(dim, name=f"carry_{li}_{p}_{c}", dtype=cdt)(h)
                    h = boundary * upd + (1.0 - boundary) * h
                    h = h * mask[..., None]
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
