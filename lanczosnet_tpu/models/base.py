"""Shared model components — the §2.2 (SURVEY.md) contract all 9 models obey.

Every model is a flax module with signature

    pred = model.apply(variables, batch: GraphBatch, deterministic: bool,
                       rngs={"dropout": ...})   # pred: [B, T]

Construction is from a plain config dict (the YAML `model:` section, same
key names as the reference configs) via each class's ``from_config``.
Loss (masked MAE, the reference's nn.L1Loss) lives here as a pure fn so
`(pred, loss)` parity with the reference forward is a one-liner.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch


def mae_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over batch and tasks (reference: nn.L1Loss)."""
    return jnp.mean(jnp.abs(pred - label))


def compute_dtype(name) -> jnp.dtype:
    """Parse the `model.dtype` config knob into a jnp dtype.

    float32 (default) is bit-identical to the pre-knob models; bfloat16
    switches the layer-loop ACTIVATIONS to bf16 while params, spectral
    cores, readout, and loss stay f32, propagation einsums pin f32
    accumulation via preferred_element_type, and the bf16 Dense/GRU
    matmuls get f32 accumulation from the TPU MXU's native behavior
    (the standard TPU mixed-precision contract, same as the sparse
    path's `SparseCitationRunner.compute_dtype`)."""
    if name is None or str(name) in ("", "float32", "f32"):
        return jnp.float32
    if str(name) in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(
        f"model.dtype must be float32 or bfloat16, got {name!r}"
    )


def flatten_feature_stack(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, C, N, F]`` per-channel feature stack → ``[B, N, C·F]``.

    The standard layout step between multi-channel propagation (edge
    types, diffusion scales, Chebyshev orders, …) and the per-layer
    Dense mix; shared so every model flattens identically.
    """
    b, c, n, f = x.shape
    return jnp.moveaxis(x, 1, 2).reshape(b, n, c * f)


def edge_message_concat(ops: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Per-edge-type propagation, flattened: ``[B,E,N,N]·[B,N,F] →
    [B,N,E·F]`` with fp32 MXU accumulation — the one-hop message block
    shared by GCN/GraphSAGE/GPNN/LanczosNet/AdaLanczosNet."""
    msg = jnp.einsum(
        "beij,bjf->beif", ops, h, preferred_element_type=jnp.float32
    )
    return flatten_feature_stack(msg)


class OneHotEmbed(nn.Module):
    """Embedding lookup computed as one-hot × table.

    For tiny vocabularies (atom types) this turns the backward pass
    from a scatter-add into an MXU matmul and the forward gather into
    a fusable contraction — the scatter fusions were visible in the r2
    step profile. Param tree ("embedding", same default init) matches
    `nn.Embed`, so checkpoints are interchangeable.
    """

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_embeddings, self.features),
        )
        onehot = jax.nn.one_hot(ids, self.num_embeddings, dtype=table.dtype)
        return onehot @ table


class NodeEncoder(nn.Module):
    """Atom-type embedding ⊕ continuous features → initial node state.

    Mirrors the reference models' `nn.Embedding(num_atom, embed_dim)`
    plus feature concat; padding (atom_type 0) is zeroed by the mask.
    """

    num_atom: int
    embed_dim: int

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jnp.ndarray:
        embed_cls = OneHotEmbed if self.num_atom <= 64 else nn.Embed
        h = embed_cls(self.num_atom, self.embed_dim, name="atom_embed")(
            batch.atom_type
        )
        if batch.node_feat is not None and batch.node_feat.shape[-1] > 0:
            h = jnp.concatenate([h, batch.node_feat], axis=-1)
        return h * batch.mask[..., None]


class AttentionReadout(nn.Module):
    """Gated attention pooling → [B, T].

    out = Σ_n mask_n · σ(a(h_n)) · g(h_n), the shared readout of every
    reference model (SURVEY.md §2.2): scalar sigmoid gate per node times
    a small MLP head, masked-summed over nodes.
    """

    num_task: int
    output_hidden_dim: Sequence[int] = ()

    @nn.compact
    def __call__(self, h: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        gate = nn.sigmoid(nn.Dense(1, name="att_gate")(h))  # [B, N, 1]
        out = h
        for i, d in enumerate(self.output_hidden_dim):
            out = nn.relu(nn.Dense(d, name=f"out_hidden_{i}")(out))
        out = nn.Dense(self.num_task, name="out_proj")(out)  # [B, N, T]
        return jnp.sum(gate * out * mask[..., None], axis=1)


class NodeHead(nn.Module):
    """Per-node classification head → [B, N, C] logits.

    The citation-config (full-graph node classification) counterpart of
    AttentionReadout: same optional hidden stack, but no pooling — each
    node keeps its own logits, padded nodes zeroed.
    """

    num_task: int
    output_hidden_dim: Sequence[int] = ()

    @nn.compact
    def __call__(self, h: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        out = h
        for i, d in enumerate(self.output_hidden_dim):
            out = nn.relu(nn.Dense(d, name=f"out_hidden_{i}")(out))
        out = nn.Dense(self.num_task, name=f"node_proj")(out)
        return out * mask[..., None]


class MLP(nn.Module):
    """Plain ReLU MLP (used for spectral filters and message functions)."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.features[:-1]):
            x = nn.relu(nn.Dense(d, name=f"dense_{i}")(x))
        return nn.Dense(self.features[-1], name=f"dense_{len(self.features) - 1}")(x)


class SumDense(nn.Module):
    """``Dense(concat(parts, -1))`` without materializing the concat.

    Registers the exact params ``nn.Dense(features)`` would for the
    concatenated input — one ``kernel [sum_i F_i, features]`` (same
    init fn, same shape, so the same PRNG draw) plus ``bias`` — but
    computes ``sum_i parts[i] @ kernel[rows_i] + bias``: each part
    contracts against its own row-slice of the kernel and the partial
    products accumulate in f32 (``preferred_element_type``), exactly
    what the MXU does internally across the concatenated contraction
    dim. The big-graph sparse models feed every layer a list of
    same-length node features (self + diffusion scales + spectral
    reconstructions); at 10M nodes × 5 parts the concat is a 3.2 GB
    bf16 buffer whose cotangent is another 3.2 GB — this layer is what
    removes both from the train step's HBM footprint (the concat form
    RESOURCE_EXHAUSTED at 10M even under `train.remat: full`).
    Checkpoint- and init-compatible with the concat form; equivalence
    is tested to f32-accumulation tolerance (tests/test_sparse.py).
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        parts = list(parts)
        in_dim = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (in_dim, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        *parts, kernel, bias = nn.dtypes.promote_dtype(
            *parts, kernel, bias, dtype=self.dtype
        )
        acc, off = None, 0
        for p in parts:
            w = jax.lax.slice_in_dim(kernel, off, off + p.shape[-1], axis=0)
            off += p.shape[-1]
            partial = jax.lax.dot_general(
                p, w, (((p.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = partial if acc is None else acc + partial
        return (acc + bias.astype(jnp.float32)).astype(kernel.dtype)
