"""MPNN — edge-conditioned messages + GRU node updates (Gilmer et al.).

Parity with reference `model/mpnn.py` (SURVEY.md §2.5): per propagation
step, messages are a per-edge-type linear transform of neighbor states
aggregated through the normalized operators, and the node state is
updated with a GRU shared across steps. The step loop is a pure
`jax.lax.scan` over explicitly-declared parameters — one compiled
while-loop, weights resident on-chip across steps, no per-step Python
dispatch (the reference pays K eager kernel launches here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, AttentionReadout, NodeEncoder, NodeHead


class MPNN(nn.Module):
    num_atom: int
    hidden_dim: Sequence[int]  # hidden_dim[0] is the state size
    num_task: int
    num_prop: int = 3
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    dtype: Any = jnp.float32  # model.dtype — bf16 propagation state

    @classmethod
    def from_config(cls, cfg: dict) -> "MPNN":
        return cls(
            num_atom=cfg["num_atom"],
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            num_prop=cfg.get("num_prop", 3),
            output_hidden_dim=tuple(cfg.get("output_hidden_dim", ())),
            dropout=cfg.get("dropout", 0.0),
            task=cfg.get("task", "graph"),
            dtype=compute_dtype(cfg.get("dtype")),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        dim = self.hidden_dim[0]
        h = NodeEncoder(self.num_atom, dim)(batch)
        if h.shape[-1] != dim:  # continuous features were concatenated
            h = nn.Dense(dim, name="in_proj")(h)
        b, n = batch.mask.shape
        num_e = batch.num_ops

        glorot = nn.initializers.glorot_uniform()
        w_msg = self.param("w_msg", glorot, (dim, num_e * dim))
        # Fused GRU weights: input and state each map to 3*dim (z|r|c).
        w_in = self.param("gru_w_in", glorot, (dim, 3 * dim))
        w_st = self.param("gru_w_st", glorot, (dim, 3 * dim))
        b_gru = self.param("gru_b", nn.initializers.zeros, (3 * dim,))
        cdt = self.dtype
        # params stay f32; the scan carries/multiplies at activation
        # dtype (weights cast ONCE outside the step loop)
        h = h.astype(cdt)
        w_msg, w_in, w_st, b_gru = (
            w_msg.astype(cdt), w_in.astype(cdt), w_st.astype(cdt),
            b_gru.astype(cdt),
        )
        mask = batch.mask[..., None].astype(cdt)

        def step(state, _):
            z = (state @ w_msg).reshape(b, n, num_e, dim)
            z = jnp.moveaxis(z, 2, 1)  # [B,E,N,F]
            m = jnp.einsum(
                "beij,bejf->bif", batch.ops, z, preferred_element_type=jnp.float32
            ).astype(cdt)
            gates_in = m @ w_in + b_gru
            gates_st = state @ w_st
            zi, ri, ci = jnp.split(gates_in, 3, axis=-1)
            zs, rs, cs = jnp.split(gates_st, 3, axis=-1)
            update = nn.sigmoid(zi + zs)
            reset = nn.sigmoid(ri + rs)
            cand = jnp.tanh(ci + reset * cs)
            new_state = ((1.0 - update) * state + update * cand) * mask
            return new_state, None

        h, _ = jax.lax.scan(step, h, None, length=self.num_prop)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
