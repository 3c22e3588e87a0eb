"""Sparse full-graph node classifiers (single graph, COO operator).

Companions to the dense `task: node` models for graphs too large for a
dense ``[N, N]`` operator (ROADMAP.md #2, VERDICT round-1 #5):

- :class:`SparseGCN` — propagation is `ops.sparse.spmv`.
- :class:`SparseChebyNet` — Chebyshev recurrence
  ``T_k = 2·S·T_{k-1} − T_{k-2}`` with spmv matvecs (same polynomial
  semantics as the dense `ops/poly.py:chebyshev_features`).
- :class:`SparseGAT` — multi-head attention with the softmax taken
  over each node's incoming COO edges plus an implicit self-edge
  (`ops.sparse.segment_softmax_coo`), never materializing [N, N].
- :class:`SparseLanczosNet` — short scales via repeated spmv, long
  scales via the low-rank ``V f(D) Vᵀ`` reconstruction from Ritz pairs
  computed by `ops.sparse.sparse_lanczos_ritz` (precomputed once per
  graph, like the dense LanczosNet's data-time D, V).
- :class:`SparseDCNN` — transition-matrix (row-stochastic) hop features.
- :class:`SparseGraphSAGE` — exact neighbor-mean aggregation + self
  concat + L2 normalize.
- :class:`SparseMPNN` — linear messages aggregated by spmv + shared GRU
  updates in a `lax.scan`.
- :class:`SparseGPNN` — partition-scheduled propagation: intra-cluster
  and cut-graph operators as masked-val views of the one edge list.
- :class:`SparseAdaLanczosNet` — learned per-edge Gaussian kernel,
  differentiable COO sym-normalization, in-forward sparse Lanczos.

All take ``(features [N, F], op: SparseOp)``-style inputs and return
``[N, C]`` logits; no padding/mask is needed — every node is real.
Every propagation/attention reduction goes through the ops/sparse.py
helpers, so when ``op.axis`` is set (edge-sharded inside a shard_map,
`parallel/mesh.py:shard_sparse_op`) the exact same model code runs
distributed with psum/pmax-completed reductions.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.models.base import MLP, SumDense
from lanczosnet_tpu.ops.sparse import (
    SparseOp,
    collective_safe_unroll,
    gat_attention,
    learned_kernel_op,
    live_degree,
    mean_spmv,
    partition_masks,
    sparse_diffusion_features,
    sparse_lanczos_ritz,
    spectral_project,
    spmv,
)


class SparseGCN(nn.Module):
    hidden_dim: Sequence[int]
    num_class: int
    dropout: float = 0.5
    # compute dtype: params stay f32, activations/gathers/scatters run
    # here; the spectral core stays f32 regardless. bf16 halves the E·F
    # memory traffic in principle, but measured on the v5e it is ~9×
    # SLOWER end-to-end — XLA's bf16 scatter-add lowering on TPU is
    # element-serialized — so the default stays f32; the knob exists
    # for backends whose scatter handles 16-bit natively.
    dtype: Any = jnp.float32
    # per-layer checkpointing (train.remat: layers) — backward replays
    # one layer at a time; see SparseLanczosNet's docstring
    remat_layers: bool = False

    def _layer(self, h, op, li, dim, deterministic):
        # SumDense == Dense(concat) without the [N, 2F] concat buffer
        h = nn.relu(
            SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(
                [h, spmv(op, h)]
            )
        )
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        layer = type(self)._layer
        if self.remat_layers:
            layer = nn.remat(layer, static_argnums=(3, 4, 5))
        h = x.astype(self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            h = layer(self, h, op, li, dim, deterministic)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseChebyNet(nn.Module):
    """Chebyshev filters of the (spectrally scaled) operator, COO form.

    Mirrors dense `models/chebynet.py` at its single-operator endpoint:
    features ``[T_0 h, …, T_P h]`` per layer, ``T_0 = h``,
    ``T_1 = S h``, ``T_k = 2 S T_{k-1} − T_{k-2}`` — each matvec an
    edge-(sharded-)spmv.
    """

    hidden_dim: Sequence[int]
    num_class: int
    poly_order: int = 3
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x.astype(self.dtype)
        two = jnp.asarray(2.0, self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            feats = [h]
            if self.poly_order >= 1:
                feats.append(spmv(op, h))
            for _ in range(self.poly_order - 1):
                feats.append(two * spmv(op, feats[-1]) - feats[-2])
            h = nn.relu(
                SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(feats)
            )
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseGAT(nn.Module):
    """Multi-head graph attention over COO edges.

    Dense `models/gat.py` semantics (additive attention, LeakyReLU,
    per-destination softmax incl. self) at sparse scale: logits live
    per edge, the softmax is a masked segment max/sum over each node's
    incoming edges plus an implicit self-edge, and aggregation is an
    attention-weighted spmv — O(E·H), never O(N²).
    """

    hidden_dim: Sequence[int]
    num_class: int
    num_head: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            head_dim = -(-dim // self.num_head)
            hp = nn.Dense(
                self.num_head * head_dim, use_bias=False,
                dtype=self.dtype, name=f"proj_{li}"
            )(h).reshape(h.shape[0], self.num_head, head_dim)  # [N, H, D]
            a_src = self.param(
                f"att_src_{li}", nn.initializers.glorot_uniform(),
                (self.num_head, head_dim),
            ).astype(self.dtype)
            a_dst = self.param(
                f"att_dst_{li}", nn.initializers.glorot_uniform(),
                (self.num_head, head_dim),
            ).astype(self.dtype)
            s_src = jnp.sum(hp * a_src[None], axis=-1)  # [N, H]
            s_dst = jnp.sum(hp * a_dst[None], axis=-1)  # [N, H]
            # edge (i <- j): destination=row (segment), source=col;
            # masked softmax + self-edge + aggregation for both op
            # kinds (RingOp = online-softmax ring, ops/sparse.py)
            msg = gat_attention(op, s_dst, s_src, hp, self.negative_slope)
            h = nn.elu(msg.reshape(h.shape[0], -1))
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseDCNN(nn.Module):
    """Diffusion-convolutional features over transition-matrix powers.

    Dense `models/dcnn.py` semantics with a row-stochastic COO operator
    (`ops.sparse.sparse_row_stochastic_operator`): per layer the hop
    features ``[P h, …, P^H h]`` are sequential edge-(sharded-)spmvs,
    mixed with the self state by one Dense.
    """

    hidden_dim: Sequence[int]
    num_class: int
    max_hop: int = 3
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x.astype(self.dtype)
        hops = tuple(range(1, self.max_hop + 1))
        for li, dim in enumerate(self.hidden_dim):
            feats = sparse_diffusion_features(op, h, hops)  # [H, N, F]
            h = nn.relu(
                SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(
                    [h, *feats]
                )
            )
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseGraphSAGE(nn.Module):
    """Mean-aggregator GraphSAGE at COO scale.

    Dense `models/graph_sage.py` semantics: exact neighbor mean over the
    operator support (independent of its normalization —
    `ops.sparse.mean_spmv`), concat self, Dense, ReLU, L2-normalize.
    """

    hidden_dim: Sequence[int]
    num_class: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            h = nn.relu(
                SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(
                    [h, mean_spmv(op, h)]
                )
            )
            # L2-normalize in f32: bf16 sums of squares lose half the
            # mantissa exactly where the norm needs it
            norm = jnp.sqrt(
                jnp.maximum(
                    jnp.sum(
                        h.astype(jnp.float32) ** 2, axis=-1, keepdims=True
                    ),
                    1e-12,
                )
            )
            h = h / norm.astype(self.dtype)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseMPNN(nn.Module):
    """Messages + GRU node updates over COO edges.

    Dense `models/mpnn.py` at its single-edge-type endpoint (citation
    graphs carry one relation): per propagation step the message is a
    linear transform of neighbor states aggregated through the
    normalized operator, and the node state updates with a GRU shared
    across steps — one `lax.scan`, weights resident across steps.
    """

    hidden_dim: Sequence[int]  # hidden_dim[0] is the state size
    num_class: int
    num_prop: int = 3
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        dim = int(self.hidden_dim[0])
        h = nn.Dense(dim, dtype=self.dtype, name="in_proj")(
            x.astype(self.dtype)
        )

        glorot = nn.initializers.glorot_uniform()
        w_msg = self.param("w_msg", glorot, (dim, dim)).astype(self.dtype)
        w_in = self.param("gru_w_in", glorot, (dim, 3 * dim)).astype(self.dtype)
        w_st = self.param("gru_w_st", glorot, (dim, 3 * dim)).astype(self.dtype)
        b_gru = self.param(
            "gru_b", nn.initializers.zeros, (3 * dim,)
        ).astype(self.dtype)

        def step(state, _):
            m = spmv(op, state @ w_msg)
            gates_in = m @ w_in + b_gru
            gates_st = state @ w_st
            zi, ri, ci = jnp.split(gates_in, 3, axis=-1)
            zs, rs, cs = jnp.split(gates_st, 3, axis=-1)
            update = nn.sigmoid(zi + zs)
            reset = nn.sigmoid(ri + rs)
            cand = jnp.tanh(ci + reset * cs)
            return (1.0 - update) * state + update * cand, None

        h, _ = jax.lax.scan(
            step, h, None, length=self.num_prop,
            unroll=collective_safe_unroll(op, self.num_prop),
        )
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseGPNN(nn.Module):
    """Partition-scheduled propagation over COO edges.

    Dense `models/gpnn.py` semantics at sparse scale: a per-node
    partition id (``part [N]``, from
    `data/partition.py:sparse_spectral_partition`) splits the edge list
    into an intra-cluster operator and the cut graph (edges crossing
    partitions, restricted to the boundary node set). The schedule —
    ``num_prop`` repetitions of ``num_intra_prop`` intra steps then
    ``num_cut_prop`` cut steps per layer — runs as masked-val COO ops
    (`ops.sparse.masked_val_op`): static shapes, identical code edge-
    sharded and not; non-boundary nodes pass through cut steps
    unchanged.
    """

    hidden_dim: Sequence[int]
    num_class: int
    num_prop: int = 2
    num_intra_prop: int = 1
    num_cut_prop: int = 1
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        op: SparseOp,
        part: jnp.ndarray,  # [N] int32 partition ids
        deterministic: bool = True,
    ) -> jnp.ndarray:
        intra_op, cut_op = partition_masks(op, part)
        boundary = (live_degree(cut_op) > 0).astype(self.dtype)[:, None]

        h = x.astype(self.dtype)
        one = jnp.asarray(1.0, self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            for p in range(self.num_prop):
                for i in range(self.num_intra_prop):
                    h = nn.relu(
                        SumDense(
                            dim, dtype=self.dtype, name=f"intra_{li}_{p}_{i}"
                        )([h, spmv(intra_op, h)])
                    )
                for c in range(self.num_cut_prop):
                    upd = nn.relu(
                        SumDense(
                            dim, dtype=self.dtype, name=f"cut_{li}_{p}_{c}"
                        )([h, spmv(cut_op, h)])
                    )
                    if h.shape[-1] != dim:
                        h = nn.Dense(
                            dim, dtype=self.dtype, name=f"carry_{li}_{p}_{c}"
                        )(h)
                    h = boundary * upd + (one - boundary) * h
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseAdaLanczosNet(nn.Module):
    """Learned kernel + in-forward Lanczos at COO scale.

    Dense `models/ada_lanczos_net.py` with the learned Gaussian kernel
    restricted to the graph support (its `use_graph_support: true`
    case — the only form that stays O(E)): per-edge kernel
    ``exp(−‖e_i − e_j‖²/√d)`` on existing edges, differentiable COO
    sym-normalization (`ops.sparse.sym_normalize_coo`), then the K-step
    Lanczos runs in-forward with the learned operator's spmv as the
    matvec callback — gradients flow through the kernel, the
    normalization, the recursion, and the tridiagonal eigensolve.
    """

    hidden_dim: Sequence[int]
    num_class: int
    kernel_dim: int = 16
    short_diffusion_dist: Sequence[int] = (1, 2)
    long_diffusion_dist: Sequence[int] = (5, 10)
    num_eig_vec: int = 20
    filter_hidden_dim: int = 16
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, op: SparseOp, deterministic: bool = True
    ) -> jnp.ndarray:
        # kernel embedding pinned f32 regardless of the storage dtype of
        # x (the runner stores features in the compute dtype): the
        # learned operator feeds the f32 Lanczos recursion below
        emb = nn.Dense(self.kernel_dim, name="kernel_embed")(
            x.astype(jnp.float32)
        )
        # per-edge Gaussian kernel on the support, sym-normalized —
        # ring form rotates the embedding blocks (ops/sparse.py)
        lop = learned_kernel_op(op, emb)
        # the Lanczos recursion and its Ritz pairs stay f32 regardless
        # of the compute dtype — orthogonality dies in bf16
        ritz_val, ritz_vec = sparse_lanczos_ritz(lop, self.num_eig_vec)

        h = x.astype(self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            parts = [h]
            if self.short_diffusion_dist:
                parts.extend(
                    sparse_diffusion_features(
                        lop, h, tuple(self.short_diffusion_dist)
                    )
                )
            for t in self.long_diffusion_dist:
                feat = jnp.stack([ritz_val, ritz_val**t], axis=-1)  # [K, 2]
                f = MLP((self.filter_hidden_dim, 1),
                        name=f"filter_{li}_t{t}")(feat)[..., 0]  # [K]
                vtx = spectral_project(lop, ritz_vec, h)  # [K, F] f32
                with jax.default_matmul_precision("float32"):
                    recon = ritz_vec @ (f[:, None] * vtx)
                parts.append(recon.astype(h.dtype))
            h = nn.relu(
                SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(parts)
            )
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)


class SparseLanczosNet(nn.Module):
    """Precomputed-Ritz LanczosNet over a COO operator.

    ``remat_layers`` (train.remat: layers) checkpoints EACH layer
    (`nn.remat` on the layer method, param paths unchanged): the
    backward replays one layer's forward at a time, so two layers'
    part-lists never coexist. This — not whole-forward
    `jax.checkpoint`, whose backward materializes every layer's replay
    in one computation — is what fits the 10M-node train step in one
    v5e's HBM (measured via scripts/mem_probe.py: 17.07 GB unremat,
    16.24 GB whole-forward, see PARITY.md).
    """

    hidden_dim: Sequence[int]
    num_class: int
    short_diffusion_dist: Sequence[int] = (1, 2)
    long_diffusion_dist: Sequence[int] = (5, 10)
    filter_hidden_dim: int = 16
    dropout: float = 0.5
    dtype: Any = jnp.float32
    remat_layers: bool = False

    def _layer(self, h, op, ritz_val, ritz_vec, li, dim, deterministic):
        parts = [h]
        if self.short_diffusion_dist:
            short = sparse_diffusion_features(
                op, h, tuple(self.short_diffusion_dist)
            )  # [S, N, F]
            parts.extend(short)
        for t in self.long_diffusion_dist:
            feat = jnp.stack([ritz_val, ritz_val**t], axis=-1)  # [K, 2]
            f = MLP((self.filter_hidden_dim, 1),
                    name=f"filter_{li}_t{t}")(feat)[..., 0]  # [K]
            # Ritz pairs are precomputed f32; the projection runs
            # f32 and only the reconstruction rejoins compute dtype
            vtx = spectral_project(op, ritz_vec, h)  # [K, F] f32
            with jax.default_matmul_precision("float32"):
                recon = ritz_vec @ (f[:, None] * vtx)
            parts.append(recon.astype(h.dtype))
        h = nn.relu(
            SumDense(dim, dtype=self.dtype, name=f"layer_{li}")(parts)
        )
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        op: SparseOp,
        ritz_val: jnp.ndarray,  # [K]
        ritz_vec: jnp.ndarray,  # [N, K]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        layer = type(self)._layer
        if self.remat_layers:
            layer = nn.remat(layer, static_argnums=(5, 6, 7))
        h = x.astype(self.dtype)
        for li, dim in enumerate(self.hidden_dim):
            h = layer(self, h, op, ritz_val, ritz_vec, li, dim, deterministic)
        return nn.Dense(self.num_class, dtype=self.dtype, name="head")(h)
