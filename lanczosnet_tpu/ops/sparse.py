"""Sparse (COO segment-sum) full-graph operators — the >>20k-node path.

The dense citation path stores the graph operator as ``[N, N]`` —
fine through Pubmed (~20k nodes, 1.5 GB) but quadratic beyond. This
module is the scalable alternative promised in ROADMAP.md #2: the
operator lives as COO edges, propagation is gather + ``segment_sum``
(XLA lowers it to a sorted scatter-add, TPU-friendly because the edge
count is static), and the SAME K-step Lanczos recursion
(`ops.lanczos.lanczos_tridiag_matvec`) runs with a sparse matvec
callback — so LanczosNet's Ritz machinery works unchanged at sparse
scale.

Shapes are static: ``num_edges`` is fixed at construction (pad with
zero-weight self-edges if streaming graphs of varying sizes).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from lanczosnet_tpu.ops.eigh import eigh_dispatch
from lanczosnet_tpu.ops.lanczos import (
    _collective_safe_unroll,
    lanczos_tridiag_matvec,
    tridiag_matrix,
)


@flax.struct.dataclass
class SparseOp:
    """Symmetric normalized graph operator in COO form.

    Attributes:
      row: ``[E]`` int32 edge sources (both directions present).
      col: ``[E]`` int32 edge destinations.
      val: ``[E]`` float32 normalized weights (exactly 0 on padding
        edges — consumers use ``val != 0`` as the edge-liveness mask).
      n: number of nodes — static pytree metadata (output shapes depend
        on it, so it must stay a concrete Python int under jit).
      axis: optional mesh-axis name. When set, the edge arrays are
        *shards* of the full edge list and every segment reduction in
        this module finishes with the matching collective
        (``psum``/``pmax``) — i.e. the op is being used inside a
        `shard_map` over that axis (`parallel/mesh.py:shard_sparse_op`).
        Because the axis tag rides the pytree, model code is identical
        sharded and unsharded.
      n_true: the TRUE (pre-padding) global node count, when the node
        axis has been padded to a mesh-size multiple (the node-sharded
        builders in `parallel/mesh.py` set it). `sparse_lanczos_ritz`
        uses it to zero the start vector on padding rows so Ritz pairs
        are device-count-invariant (padding amount varies with the mesh
        size; without this, pad nodes get nonzero start weight and one
        Krylov direction is spent on eigenvalue 0). ``None`` = every
        row is real.
      rows_sorted: static promise that ``row`` is non-decreasing, which
        lets every segment reduction pass ``indices_are_sorted=True`` —
        XLA then lowers the scatter-add as run-length block sums instead
        of a general scatter (measured 73→40 ms on the 5M-edge/F=128
        scatter, 1.47× on the whole spmv, v5e). The constructors sort at
        build time and the mesh builders preserve the order (boolean-mask
        bucketing keeps relative order; padding rows use the largest
        local row id); hand-built ops default to False.
      gather_axis: optional mesh-axis name for the *node-sharded* mode
        (`parallel/mesh.py:node_shard_sparse_op`): node arrays are
        sharded into contiguous blocks of ``n`` rows per device and the
        edge shard holds exactly the edges whose DESTINATION lies in
        this device's block (``row`` is block-local, ``col`` global).
        Every segment reduction is then fully local — no psum — and the
        one collective is the source gather: anything indexed by
        ``col`` goes through :func:`gather_nodes` (``all_gather`` over
        ICI; its transpose is a reduce-scatter, so gradients ride the
        same links). Mutually exclusive with ``axis``.
    """

    row: jnp.ndarray
    col: jnp.ndarray
    val: jnp.ndarray
    n: int = flax.struct.field(pytree_node=False)
    axis: str | None = flax.struct.field(pytree_node=False, default=None)
    gather_axis: str | None = flax.struct.field(
        pytree_node=False, default=None
    )
    n_true: int | None = flax.struct.field(pytree_node=False, default=None)
    rows_sorted: bool = flax.struct.field(pytree_node=False, default=False)
    # [E] int32 permutation that sorts ``col`` non-decreasing, or None.
    # Forward gathers don't need it — it exists for the TRANSPOSE: the
    # VJP of every ``x[col]`` edge gather is a scatter-add at col, which
    # is unsorted in the destination-major layout. `edge_gather` uses
    # this to run the backward scatter sorted (same run-length-block-sum
    # lowering the forward `_segsum` gets from rows_sorted) and to
    # accumulate 16-bit cotangents in f32 (the element-serialized bf16
    # scatter trap, measured ~9×). Constructors and the mesh builders
    # fill it in; hand-built ops may leave it None (plain scatter).
    col_perm: jnp.ndarray | None = None

    def __post_init__(self):
        if self.axis is not None and self.gather_axis is not None:
            raise ValueError(
                "SparseOp cannot be both edge-sharded (axis) and "
                "node-sharded (gather_axis)"
            )

    def shard_specs(self, axis: str):
        """This op as a `shard_map` spec tree: every edge-array leaf
        ``P(axis)`` (static fields ride the treedef unchanged, so the
        spec tree and the op always stay structurally in sync)."""
        p = jax.sharding.PartitionSpec(axis)
        return self.replace(
            row=p, col=p, val=p,
            col_perm=None if self.col_perm is None else p,
        )


def sparse_sym_operator(
    edges: np.ndarray, n: int, eps: float = 1e-12
) -> SparseOp:
    """Build ``D^{-1/2} A D^{-1/2}`` in COO from an undirected edge list.

    Args:
      edges: ``[E_undirected, 2]`` int array of (i, j) pairs, i != j.
      n: node count.
    """
    e = np.asarray(edges, np.int64)
    row = np.concatenate([e[:, 0], e[:, 1]])
    col = np.concatenate([e[:, 1], e[:, 0]])
    deg = np.bincount(row, minlength=n).astype(np.float64)
    inv_sqrt = np.where(deg > eps, 1.0 / np.sqrt(np.maximum(deg, eps)), 0.0)
    val = (inv_sqrt[row] * inv_sqrt[col]).astype(np.float32)
    order = np.argsort(row, kind="stable")  # destination-major layout
    col = col[order]
    return SparseOp(
        row=jnp.asarray(row[order], jnp.int32),
        col=jnp.asarray(col, jnp.int32),
        val=jnp.asarray(val[order]),
        n=n,
        rows_sorted=True,
        col_perm=jnp.asarray(np.argsort(col, kind="stable"), jnp.int32),
    )


def sparse_row_stochastic_operator(
    edges: np.ndarray, n: int
) -> SparseOp:
    """Build the transition matrix ``D^{-1} A`` in COO form (row-
    stochastic — DCNN's diffusion operator, the sparse analog of the
    dense pipeline's ``operator_kind: row``)."""
    e = np.asarray(edges, np.int64)
    row = np.concatenate([e[:, 0], e[:, 1]])
    col = np.concatenate([e[:, 1], e[:, 0]])
    deg = np.bincount(row, minlength=n).astype(np.float64)
    val = (1.0 / np.maximum(deg, 1.0))[row].astype(np.float32)
    order = np.argsort(row, kind="stable")
    col = col[order]
    return SparseOp(
        row=jnp.asarray(row[order], jnp.int32),
        col=jnp.asarray(col, jnp.int32),
        val=jnp.asarray(val[order]),
        n=n,
        rows_sorted=True,
        col_perm=jnp.asarray(np.argsort(col, kind="stable"), jnp.int32),
    )


@flax.struct.dataclass
class RingOp:
    """Node-sharded COO operator in ring-pipelined form.

    Like the ``gather_axis`` mode of :class:`SparseOp` (destination
    bucketing: this device owns all edges into its node block), but the
    edges are ADDITIONALLY bucketed by source block: ``row/col/val`` are
    ``[D, E2]`` — slice ``s`` holds the edges whose source lies in node
    block ``s``, with ``row`` block-local to this device and ``col``
    block-local to the source. :func:`ring_spmv` then never materializes
    the full ``[N, F]`` source array: the D source blocks travel the
    ring one hop per step (``ppermute``), each multiplied against the
    matching edge slice while the next block is in flight — transient
    memory is TWO blocks instead of N·F, and transfer overlaps compute
    on ICI. Gradients ride the transposed ring (ppermute's transpose is
    the reverse rotation).
    """

    row: jnp.ndarray  # [D, E2] destination rows, local to this device
    col: jnp.ndarray  # [D, E2] source cols, local to the source block
    val: jnp.ndarray  # [D, E2] weights (0 = padding edge)
    n: int = flax.struct.field(pytree_node=False)  # local rows per block
    axis: str = flax.struct.field(pytree_node=False, default="data")
    n_true: int | None = flax.struct.field(pytree_node=False, default=None)
    # rows within EACH [D] slice are non-decreasing (the flattened [D·E2]
    # view is NOT — per-slice reductions may pass indices_are_sorted,
    # whole-op flattened ones may not)
    rows_sorted: bool = flax.struct.field(pytree_node=False, default=False)

    def shard_specs(self, axis: str):
        """Spec tree for `shard_map` in_specs (see SparseOp.shard_specs)."""
        p = jax.sharding.PartitionSpec(axis)
        return self.replace(row=p, col=p, val=p)


def ring_spmv(rop: RingOp, x: jnp.ndarray) -> jnp.ndarray:
    """``S @ x`` with node-sharded x ``[n_local, F]`` and the operator in
    ring form; returns this device's ``[n_local, F]`` output rows."""
    d = jax.lax.psum(1, rop.axis)
    me = jax.lax.axis_index(rop.axis)
    perm = [(i, (i - 1) % d) for i in range(d)]
    # the zero accumulator must carry the device-varying vma type or
    # the scan rejects the carry as type-changing (same as the sharded
    # Lanczos carry in ops/lanczos.py)
    acc0 = jax.lax.pcast(
        jnp.zeros((rop.n,) + x.shape[1:], x.dtype), (rop.axis,), to="varying"
    )

    def step(carry, s):
        block, acc = carry  # block = source block of device (me + s) % d
        src = jax.lax.rem(me + s, d)
        rows = jax.lax.dynamic_index_in_dim(rop.row, src, 0, keepdims=False)
        cols = jax.lax.dynamic_index_in_dim(rop.col, src, 0, keepdims=False)
        vals = jax.lax.dynamic_index_in_dim(
            rop.val, src, 0, keepdims=False
        ).astype(x.dtype)
        msg = vals[:, None] * block[cols] if x.ndim == 2 else vals * block[cols]
        acc = acc + _segsum(msg, rows, rop.n, rop.rows_sorted)
        block = jax.lax.ppermute(block, rop.axis, perm)
        return (block, acc), None

    # unroll: every ppermute gets its own HLO instruction on the CPU
    # test mesh — a multi-trip ring reuses one rendezvous key per hop
    # (see ops/lanczos.py:_collective_safe_unroll)
    (_, acc), _ = jax.lax.scan(
        step, (x, acc0), jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(rop.axis, d),
    )
    return acc


def ring_mean_spmv(rop: RingOp, x: jnp.ndarray) -> jnp.ndarray:
    """Exact neighbor mean in ring form (GraphSAGE's aggregator): the
    live-edge count accumulates alongside the messages, so degrees are
    complete without any extra pass."""
    d = jax.lax.psum(1, rop.axis)
    me = jax.lax.axis_index(rop.axis)
    perm = [(i, (i - 1) % d) for i in range(d)]
    acc0 = jax.lax.pcast(
        jnp.zeros((rop.n,) + x.shape[1:], x.dtype), (rop.axis,), to="varying"
    )
    deg0 = jax.lax.pcast(
        jnp.zeros((rop.n,), x.dtype), (rop.axis,), to="varying"
    )

    def step(carry, s):
        block, acc, deg = carry
        src = jax.lax.rem(me + s, d)
        rows = jax.lax.dynamic_index_in_dim(rop.row, src, 0, keepdims=False)
        cols = jax.lax.dynamic_index_in_dim(rop.col, src, 0, keepdims=False)
        vals = jax.lax.dynamic_index_in_dim(rop.val, src, 0, keepdims=False)
        live = (vals != 0.0).astype(x.dtype)
        msg = live[:, None] * block[cols] if x.ndim == 2 else live * block[cols]
        acc = acc + _segsum(msg, rows, rop.n, rop.rows_sorted)
        deg = deg + _segsum(live, rows, rop.n, rop.rows_sorted)
        block = jax.lax.ppermute(block, rop.axis, perm)
        return (block, acc, deg), None

    (_, acc, deg), _ = jax.lax.scan(
        step, (x, acc0, deg0), jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(rop.axis, d),
    )
    deg = jnp.maximum(deg, 1.0)
    return acc / (deg[:, None] if x.ndim == 2 else deg)


def _ring_env(rop: RingOp):
    """(device count, my index, one-hop-back permutation) of the ring."""
    d = jax.lax.psum(1, rop.axis)
    me = jax.lax.axis_index(rop.axis)
    perm = [(i, (i - 1) % d) for i in range(d)]
    return d, me, perm


def _ring_slice(rop: RingOp, src) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """This device's (rows, cols, vals) edge slice whose sources live in
    node block ``src`` (rows local to this device, cols to the source)."""
    rows = jax.lax.dynamic_index_in_dim(rop.row, src, 0, keepdims=False)
    cols = jax.lax.dynamic_index_in_dim(rop.col, src, 0, keepdims=False)
    vals = jax.lax.dynamic_index_in_dim(rop.val, src, 0, keepdims=False)
    return rows, cols, vals


def _pcast_zeros(shape, dtype, axis):
    """Zero scan-carry with the device-varying vma type shard_map scans
    require (same gotcha as ring_spmv's accumulator)."""
    return jax.lax.pcast(jnp.zeros(shape, dtype), (axis,), to="varying")


def gat_attention(
    op: SparseOp,
    s_dst: jnp.ndarray,
    s_src: jnp.ndarray,
    hp: jnp.ndarray,
    negative_slope: float = 0.2,
    eps: float = 1e-16,
) -> jnp.ndarray:
    """GAT's masked neighborhood attention in one call, both op kinds.

    Per destination node: softmax over its live incoming edges PLUS an
    implicit self-edge, logits ``leaky_relu(s_dst[dst] + s_src[src])``,
    aggregation ``Σ p_e · hp[src]`` — returns the normalized ``[N, H, D]``
    messages (self term included).

    SparseOp: composes `segment_softmax_coo` + `attention_spmv` (the
    gather mode / unsharded path). RingOp: an ONLINE-softmax ring — the
    graph analog of ring attention. The source blocks of ``s_src`` and
    ``hp`` rotate one hop per step (`ppermute`), and each destination
    carries a running max ``m``, denominator and weighted sum that are
    rescaled by ``exp(m − m_new)`` as new source blocks arrive; the self
    edge folds in after the last hop. Exact (not approximate): softmax
    is invariant to the running max, whose gradient is cut like the
    sparse path's segment max. Destination bucketing means every
    segment reduction is device-local — the only communication is the
    two rotating blocks.
    """
    self_logits = jax.nn.leaky_relu(s_dst + s_src, negative_slope)  # [n, H]
    if not isinstance(op, RingOp):
        logits = jax.nn.leaky_relu(
            s_dst[op.row] + edge_gather(op, s_src), negative_slope
        )  # [E, H]
        p, denom, p_self = segment_softmax_coo(logits, op, self_logits)
        msg = attention_spmv(op, p, hp) + p_self[..., None] * hp
        return msg / denom[..., None].astype(hp.dtype)

    d, me, perm = _ring_env(op)
    n, h = s_dst.shape
    neg = jnp.asarray(-1e30, s_dst.dtype)
    # -1e30 (not -inf) so the never-updated state stays NaN-free:
    # exp(neg - neg) = 1 rescales an empty accumulator, exp(neg - m)
    # underflows to 0 — no inf - inf anywhere
    m0 = jax.lax.pcast(
        jnp.full((n, h), neg, s_dst.dtype), (op.axis,), to="varying"
    )
    den0 = _pcast_zeros((n, h), s_dst.dtype, op.axis)
    acc0 = _pcast_zeros(hp.shape, hp.dtype, op.axis)

    def step(carry, s):
        s_blk, hp_blk, m, den, acc = carry
        src = jax.lax.rem(me + s, d)
        rows, cols, vals = _ring_slice(op, src)
        live = (vals != 0.0).astype(s_dst.dtype)[:, None]  # [E2, 1]
        logits = jax.nn.leaky_relu(
            s_dst[rows] + s_blk[cols], negative_slope
        )  # [E2, H]
        masked = jnp.where(live > 0, logits, neg)
        m_s = jax.ops.segment_max(
            jax.lax.stop_gradient(masked), rows, num_segments=n,
            indices_are_sorted=op.rows_sorted,
        )
        m_new = jnp.maximum(m, jnp.maximum(m_s, neg))
        scale = jnp.exp(m - m_new)  # ≤ 1; ==1 while both are neg
        p = jnp.exp(masked - m_new[rows]) * live  # dead edges exactly 0
        den = den * scale + _segsum(p, rows, n, op.rows_sorted)
        acc = acc * scale[..., None] + _segsum(
            p[..., None].astype(hp.dtype) * hp_blk[cols], rows, n,
            op.rows_sorted,
        )
        s_blk = jax.lax.ppermute(s_blk, op.axis, perm)
        hp_blk = jax.lax.ppermute(hp_blk, op.axis, perm)
        return (s_blk, hp_blk, m_new, den, acc), None

    (_, _, m, den, acc), _ = jax.lax.scan(
        step, (s_src, hp, m0, den0, acc0), jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(op.axis, d),
    )
    # fold the implicit self-edge exactly like the sparse path does
    m_fin = jnp.maximum(m, jax.lax.stop_gradient(self_logits))
    rescale = jnp.exp(m - m_fin)
    p_self = jnp.exp(self_logits - m_fin)
    den = den * rescale + p_self
    acc = acc * rescale[..., None] + p_self[..., None] * hp
    return acc / jnp.maximum(den, eps)[..., None].astype(hp.dtype)


def partition_masks(op, part: jnp.ndarray):
    """Split an operator into (intra, cut) views by per-node partition
    ids — GPNN's schedule operators, both op kinds.

    ``part [n]`` (node-sharded: this device's block). Intra keeps edges
    whose endpoints share a partition, cut the crossers; both are free
    `masked_val_op` views (static shapes). RingOp: the partition vector
    itself rides the ring once so each edge slice compares against its
    SOURCE block's ids.
    """
    if not isinstance(op, RingOp):
        same = part[op.row] == gather_nodes(op, part)[op.col]
        return masked_val_op(op, same), masked_val_op(op, ~same)

    d, me, perm = _ring_env(op)

    def step(block, s):
        src = jax.lax.rem(me + s, d)
        rows, cols, _ = _ring_slice(op, src)
        same_s = part[rows] == block[cols]
        block = jax.lax.ppermute(block, op.axis, perm)
        return block, (src, same_s)

    _, (srcs, same_steps) = jax.lax.scan(
        step, part, jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(op.axis, d),
    )
    # scan stacks in STEP order; edge slices are indexed by SOURCE block
    same = jnp.zeros(op.val.shape, bool).at[srcs].set(same_steps)
    return masked_val_op(op, same), masked_val_op(op, ~same)


def learned_kernel_op(op, emb: jnp.ndarray, eps: float = 1e-12):
    """AdaLanczosNet's learned operator on the edge support, both kinds:
    per-edge Gaussian kernel ``exp(−‖e_dst − e_src‖²/√dim)`` of node
    embeddings, symmetrically normalized — differentiable end to end.

    SparseOp: one gather + `sym_normalize_coo`. RingOp: two ring
    passes — the embedding blocks rotate once to evaluate the kernel
    per (dst, src) edge slice, then (degrees being destination-local
    sums over all slices) the ``[n_local]`` inverse-sqrt-degree vector
    rotates once more to scale each slice by its source's normalizer.
    """
    scale = jnp.sqrt(jnp.asarray(float(emb.shape[-1]), emb.dtype))
    if not isinstance(op, RingOp):
        d2 = jnp.sum((emb[op.row] - edge_gather(op, emb)) ** 2, -1)
        return sym_normalize_coo(op, jnp.exp(-d2 / scale), eps)

    d, me, perm = _ring_env(op)

    def kstep(block, s):
        src = jax.lax.rem(me + s, d)
        rows, cols, vals = _ring_slice(op, src)
        live = (vals != 0.0).astype(emb.dtype)
        d2 = jnp.sum((emb[rows] - block[cols]) ** 2, axis=-1)
        k_s = jnp.exp(-d2 / scale) * live
        block = jax.lax.ppermute(block, op.axis, perm)
        return block, (src, k_s)

    _, (srcs, k_steps) = jax.lax.scan(
        kstep, emb, jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(op.axis, d),
    )
    kval = jnp.zeros(op.val.shape, emb.dtype).at[srcs].set(k_steps)
    # destination bucketing: EVERY incoming edge of a local row is in
    # one of this device's slices, so the degree sum is local
    deg = jax.ops.segment_sum(
        kval.reshape(-1), op.row.reshape(-1), num_segments=op.n
    )
    inv = jnp.where(deg > eps, jax.lax.rsqrt(jnp.maximum(deg, eps)), 0.0)

    def nstep(block, s):
        src = jax.lax.rem(me + s, d)
        rows, cols, _ = _ring_slice(op, src)
        k_s = jax.lax.dynamic_index_in_dim(kval, src, 0, keepdims=False)
        v_s = k_s * inv[rows] * block[cols]
        block = jax.lax.ppermute(block, op.axis, perm)
        return block, (src, v_s)

    _, (srcs2, v_steps) = jax.lax.scan(
        nstep, inv, jnp.arange(d, dtype=jnp.int32),
        unroll=_collective_safe_unroll(op.axis, d),
    )
    val = jnp.zeros(op.val.shape, emb.dtype).at[srcs2].set(v_steps)
    return op.replace(val=val)


def collective_safe_unroll(op, length: int) -> int:
    """Unroll factor for a loop whose body applies a (possibly sharded)
    COO op — full unroll on the CPU test mesh so every collective the
    body emits gets its own HLO instruction per trip (rendezvous-key
    reuse hazard, ops/lanczos.py:_collective_safe_unroll); 1 elsewhere."""
    axis = (
        op.axis if isinstance(op, RingOp)
        else (op.gather_axis if op.gather_axis is not None else op.axis)
    )
    return _collective_safe_unroll(axis, length)


def gather_nodes(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """Materialize the full node-axis view of ``x`` for ``col`` indexing.

    Unsharded / edge-sharded ops: identity (x already spans all nodes).
    Node-sharded ops: ``all_gather`` the per-device blocks into the
    global ``[n_total, ...]`` array — transient (alive only for the
    gather-index-reduce), so persistent state stays 1/D per device.
    """
    if op.gather_axis is None:
        return x
    return jax.lax.all_gather(x, op.gather_axis, axis=0, tiled=True)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _take_sorted_bwd(xg, col, col_perm, axis):
    return xg[col]


def _take_sorted_bwd_fwd(xg, col, col_perm, axis):
    return xg[col], (col, col_perm, xg.shape[0])


# Backward-scatter transient bound: above _BWD_CHUNK_ENGAGE bytes the
# sorted cotangent scatter runs in ~_BWD_CHUNK_TARGET-byte chunks, so
# the widened f32 [E, F] operand never materializes whole (at 10M
# nodes / 25M edges it alone was 2.98 GB of the step's HBM peak; with
# the un-chunked layout the step needed 16.6 GB vs the v5e's 15.75).
# Shapes are static, so the chunk count is decided at trace time and
# small programs keep the exact single-scatter lowering they were
# measured with.
_BWD_CHUNK_ENGAGE = 2 * 1024**3
_BWD_CHUNK_TARGET = 1 * 1024**3


def _bf16_sorted_scatter() -> bool:
    """Opt-in: accumulate SORTED cotangent scatters in the 16-bit
    cotangent dtype instead of widening to f32 first (halves the
    scatter operand + destination bytes). The r2 measurement that
    mandated f32 accumulation — bf16 scatter-add ~9× slower than f32 —
    was an UNSORTED-lowering artifact; with ``col_perm`` the scatter
    runs as run-length block sums, so whether a sorted 16-bit
    accumulation lowers fast is a separate question (VERDICT r4 #2).
    Numerics: 16-bit accumulation loses mantissa on high-degree nodes;
    tests/test_sparse_bf16_scatter.py bounds the gradient deviation.
    Read at TRACE time (env, process-scoped) so the A/B sweep can flip
    it per subprocess without threading a knob through every model."""
    import os

    return os.environ.get("LANCZOSNET_BF16_SCATTER", "0") not in ("", "0")


def _take_sorted_bwd_bwd(axis, res, g):
    col, col_perm, n = res
    dt = g.dtype  # cotangent dtype == primal output dtype == xg's
    narrow = dt in (jnp.bfloat16, jnp.float16)
    if narrow and col_perm is not None and _bf16_sorted_scatter():
        narrow = False  # accumulate in the cotangent's own 16-bit dtype
    acc_dt = jnp.float32 if narrow else dt
    if col_perm is not None:
        # permute in the cotangent's own dtype and widen AFTER: the
        # [E, F] permutation gather then reads half the bytes for bf16,
        # and the f32 copy of g never coexists with its permuted copy
        # (the 16-bit→f32 widening is exact, so permute-then-convert
        # == convert-then-permute bitwise)
        e = g.shape[0]
        op_bytes = g.size * 4  # widened operand
        if op_bytes > _BWD_CHUNK_ENGAGE:
            nchunk = -(-op_bytes // _BWD_CHUNK_TARGET)
            csize = -(-e // nchunk)
            dx = jnp.zeros((n,) + g.shape[1:], acc_dt)
            for s in range(0, e, csize):
                sl = col_perm[s : s + csize]
                part = jnp.take(g, sl, axis=0)
                if narrow:
                    part = part.astype(jnp.float32)
                # each contiguous slice of the global sort stays sorted
                dx = dx.at[jnp.take(col, sl)].add(
                    part, indices_are_sorted=True
                )
        else:
            acc = jnp.take(g, col_perm, axis=0)
            if narrow:
                acc = acc.astype(jnp.float32)
            dx = jax.ops.segment_sum(
                acc,
                jnp.take(col, col_perm),
                num_segments=n,
                indices_are_sorted=True,
            )
    else:
        dx = jax.ops.segment_sum(
            g.astype(jnp.float32) if narrow else g, col, num_segments=n
        )
    if axis is not None:
        # edge-sharded mode: the gathered operand was REPLICATED across
        # the edge shards, so its cotangent is the cross-shard sum (the
        # psum plain autodiff would have inserted as the broadcast
        # transpose) — and the psum also discharges the varying vma
        # type, matching the replicated primal
        dx = jax.lax.psum(dx, axis)
    return dx.astype(dt), None, None


_take_sorted_bwd.defvjp(_take_sorted_bwd_fwd, _take_sorted_bwd_bwd)


def edge_gather(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """``gather_nodes(op, x)[op.col]`` with a transpose that scatters
    SORTED and in f32 — use it wherever the gathered operand is
    differentiable.

    Autodiff's transpose of an edge gather is a scatter-add at ``col``,
    which the destination-major edge layout leaves unsorted — the one
    scatter the forward path's ``rows_sorted`` promise cannot reach
    (measured: the whole bf16 e2e sparse step was ~1.85× SLOWER than
    f32 because that cotangent scatter lowers element-serialized on
    TPU). The custom VJP permutes the cotangents with ``op.col_perm``
    so the scatter runs as run-length block sums, accumulating 16-bit
    cotangents in f32; the extra cost is one [E(,F)] permutation gather.
    Falls back to an unsorted (still f32-accumulated) scatter when the
    op carries no ``col_perm``. Forward values are bit-identical to
    plain indexing; ``gather_nodes``'s all_gather keeps its own
    reduce-scatter transpose.
    """
    return _take_sorted_bwd(gather_nodes(op, x), op.col, op.col_perm, op.axis)


def spectral_project(
    op: SparseOp, ritz_vec: jnp.ndarray, h: jnp.ndarray
) -> jnp.ndarray:
    """``Vᵀ h`` — the node-axis contraction of LanczosNet's low-rank
    long-scale term. Node-sharded ops (gather or ring form) hold V and
    h as row blocks, so the local ``[K, F]`` partial is psum-completed.
    Runs at full f32 precision like the dense path — bf16 MXU inputs
    (the TPU default) would silently halve the spectral features'
    mantissa."""
    with jax.default_matmul_precision("float32"):
        vtx = ritz_vec.T @ h
    axis = op.axis if isinstance(op, RingOp) else op.gather_axis
    if axis is not None:
        vtx = jax.lax.psum(vtx, axis)
    return vtx


def live_degree(op: SparseOp) -> jnp.ndarray:
    """Per-node count of live incoming edges (``val != 0``), psum-
    completed across edge shards — the structural degree regardless of
    the operator's normalization. RingOp: destination bucketing makes
    the count local (all of a row's incoming edges are in this device's
    slices) — flatten the [D, E2] slices, no collective."""
    live = (op.val != 0.0).astype(jnp.float32)
    if isinstance(op, RingOp):
        return jax.ops.segment_sum(
            live.reshape(-1), op.row.reshape(-1), num_segments=op.n
        )
    deg = jax.ops.segment_sum(
        live, op.row, num_segments=op.n, indices_are_sorted=op.rows_sorted
    )
    if op.axis is not None:
        deg = jax.lax.psum(deg, op.axis)
    return deg


def mean_spmv(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """Exact neighbor mean over the operator's support, independent of
    its normalization (GraphSAGE's aggregator — the sparse analog of
    dense `models/graph_sage.py` recomputing ``support / deg``)."""
    if isinstance(op, RingOp):
        return ring_mean_spmv(op, x)
    live = (op.val != 0.0).astype(x.dtype)
    xg = edge_gather(op, x)
    msg = live[:, None] * xg if x.ndim == 2 else live * xg
    out = _segsum(msg, op.row, op.n, op.rows_sorted)
    deg = _segsum(live, op.row, op.n, op.rows_sorted)
    if op.axis is not None:
        out = jax.lax.psum(out, op.axis)
        deg = jax.lax.psum(deg, op.axis)
    deg = jnp.maximum(deg, 1.0)
    return out / (deg[:, None] if x.ndim == 2 else deg)


def masked_val_op(op: SparseOp, keep: jnp.ndarray) -> SparseOp:
    """A view of ``op`` with edges where ``keep`` is False zeroed out.

    Keeps shapes static (liveness rides ``val != 0``), so partition-
    restricted operators (GPNN's intra/cut split) are free elementwise
    masks — no gather/compaction, identical code sharded and not.
    """
    return op.replace(val=jnp.where(keep, op.val, 0.0))


def sym_normalize_coo(
    op: SparseOp, kernel: jnp.ndarray, eps: float = 1e-12
) -> SparseOp:
    """``D^{-1/2} K D^{-1/2}`` of per-edge kernel weights, differentiably.

    The sparse counterpart of `ops/normalize.py:sym_normalize` for a
    learned kernel living on the COO support (AdaLanczosNet's in-forward
    operator): degrees are segment sums of the kernel (psum-completed
    across edge shards), and gradients flow through both the kernel and
    the normalization. (RingOp callers go through `learned_kernel_op`,
    which runs the slice-form equivalent.)
    """
    if isinstance(op, RingOp):
        raise TypeError(
            "sym_normalize_coo takes a SparseOp; for ring form use "
            "learned_kernel_op"
        )
    live = (op.val != 0.0).astype(kernel.dtype)
    k = kernel * live
    deg = jax.ops.segment_sum(
        k, op.row, num_segments=op.n, indices_are_sorted=op.rows_sorted
    )
    if op.axis is not None:
        deg = jax.lax.psum(deg, op.axis)
    inv_sqrt = jnp.where(deg > eps, jax.lax.rsqrt(jnp.maximum(deg, eps)), 0.0)
    # Node-sharded: deg is complete locally (all incoming edges of a
    # row live on its device), but the source side needs the gather.
    return op.replace(
        val=k * inv_sqrt[op.row] * edge_gather(op, inv_sqrt)
    )


def _segsum(
    msg: jnp.ndarray, rows: jnp.ndarray, n: int, sorted: bool = False
) -> jnp.ndarray:
    """segment_sum with the two TPU scatter-add lessons baked in:

    - ``sorted`` forwards the op's ``rows_sorted`` promise as
      ``indices_are_sorted=True`` — the single biggest sparse-path win
      (the scatter lowers as run-length block sums: 73→40 ms on the
      5M-edge/F=128 scatter, v5e).
    - 16-bit messages accumulate in f32 and cast back: XLA's bf16
      scatter-add lowers element-serialized on TPU (measured ~9× slower
      than f32), so the narrow dtype is kept only on the E·F gather
      reads that feed ``msg``.
    """
    if msg.dtype in (jnp.bfloat16, jnp.float16):
        return jax.ops.segment_sum(
            msg.astype(jnp.float32), rows, num_segments=n,
            indices_are_sorted=sorted,
        ).astype(msg.dtype)
    return jax.ops.segment_sum(
        msg, rows, num_segments=n, indices_are_sorted=sorted
    )


def spmv(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """``S @ x`` for x ``[N]`` or ``[N, F]`` via gather + segment-sum.

    With ``op.axis`` set (edge-sharded inside a `shard_map`), each
    device segment-sums its local edges and the partial node vectors
    are ``psum``-reduced over ICI — the COO analog of a row-sharded
    matvec. x is replicated; memory scales as E/n_devices + N·F.

    With ``op.gather_axis`` set (node-sharded), x is this device's row
    block, sources are all-gathered, and the destination-bucketed edge
    layout makes the segment sum complete without any reduction.

    Follows x's dtype (weights cast): with bf16 activations the E·F
    gather+scatter traffic — the sparse step's bound, measured ~0.3
    FLOPs/byte — halves; the f32 spectral core is unaffected because
    its vectors are f32 so the cast is a no-op there.

    A :class:`RingOp` takes the ring-pipelined path instead.
    """
    if isinstance(op, RingOp):
        return ring_spmv(op, x)
    val = op.val.astype(x.dtype)
    xg = edge_gather(op, x)
    msg = val[:, None] * xg if x.ndim == 2 else val * xg
    out = _segsum(msg, op.row, op.n, op.rows_sorted)
    if op.axis is not None:
        out = jax.lax.psum(out, op.axis)
    return out


def segment_softmax_coo(
    logits: jnp.ndarray,
    op: SparseOp,
    self_logits: jnp.ndarray | None = None,
    eps: float = 1e-16,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """Numerically-stable softmax over each node's incoming edges.

    Args:
      logits: ``[E, ...]`` per-edge attention logits (leading dim E
        aligned with op.row/col; trailing dims e.g. heads).
      op: the COO operator — ``row`` defines the softmax segments,
        ``val != 0`` masks padding edges out of the distribution.
      self_logits: optional ``[N, ...]`` logits of an implicit
        self-edge per node, included in the normalization (GAT's
        self-attention without materializing self-loops in the COO).

    Returns ``(p_edges [E, ...], denom [N, ...], p_self [N, ...]|None)``
    with ``p`` unnormalized exp-weights; callers divide their segment
    sums by ``denom``. Sharded ops reduce max/denominator with
    pmax/psum so the distribution spans ALL edge shards.
    """
    live = (op.val != 0.0).astype(logits.dtype)
    live = live.reshape(live.shape + (1,) * (logits.ndim - 1))
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = jnp.where(live > 0, logits, neg)
    # m only stabilizes the exp — softmax is invariant to it, so
    # cutting its gradient is exact; it must be cut BEFORE pmax, which
    # has no differentiation rule at all (this is what makes the
    # sharded path differentiable)
    m = jax.ops.segment_max(
        jax.lax.stop_gradient(masked), op.row, num_segments=op.n,
        indices_are_sorted=op.rows_sorted,
    )
    if op.axis is not None:
        m = jax.lax.pmax(m, op.axis)
    if self_logits is not None:
        m = jnp.maximum(m, jax.lax.stop_gradient(self_logits))
    m = jnp.maximum(m, neg)  # empty segments: segment_max yields -inf
    # exp the MASKED logits so a padding edge can never overflow past m
    p = jnp.exp(masked - m[op.row]) * live
    denom = _segsum(p, op.row, op.n, op.rows_sorted)
    if op.axis is not None:
        denom = jax.lax.psum(denom, op.axis)
    p_self = None
    if self_logits is not None:
        p_self = jnp.exp(self_logits - m)
        denom = denom + p_self
    return p, jnp.maximum(denom, eps), p_self


def attention_spmv(
    op: SparseOp, p: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """``Σ_{e: row=i} p_e · x[col_e]`` — message aggregation with
    per-edge weights ``p [E, ...]`` broadcast against ``x[col] [E, ..., F]``;
    psum-reduced across edge shards like `spmv`."""
    out = _segsum(
        p[..., None].astype(x.dtype) * edge_gather(op, x),
        op.row, op.n, op.rows_sorted,
    )
    if op.axis is not None:
        out = jax.lax.psum(out, op.axis)
    return out


@partial(jax.jit, static_argnames=("k",))
def sparse_lanczos_ritz(
    op: SparseOp, k: int, eps: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ritz pairs of a sparse operator — the dense pipeline's
    `lanczos_ritz`, with the matvec running over COO edges.

    Returns ``(ritz_val [k], ritz_vec [N, k])``. Node-sharded ops run
    the exact global recursion (inner products psum over the node
    axis, the start vector is indexed by global node id) and return
    this device's ``[n_local, k]`` rows of the Ritz vectors;
    ``ritz_val`` comes out bitwise-replicated. When ``op.n_true`` is
    set, padding rows (global id >= n_true) are masked out of the
    start vector so Ritz pairs are identical for every device count.
    """
    shard_axis = (
        op.axis if isinstance(op, RingOp) else op.gather_axis
    )
    offset = (
        jax.lax.axis_index(shard_axis) * op.n
        if shard_axis is not None
        else 0
    )
    if op.n_true is not None:
        ids = offset + jnp.arange(op.n, dtype=jnp.int32)
        mask = (ids < op.n_true).astype(jnp.float32)
    else:
        mask = jnp.ones((op.n,), jnp.float32)
    alphas, betas, q = lanczos_tridiag_matvec(
        lambda v: spmv(op, v), mask, k, eps,
        axis=shard_axis, index_offset=offset,
    )
    t = tridiag_matrix(alphas, betas)
    vals, u = eigh_dispatch(t)
    # Ritz rotation at full f32 (matches the dense lanczos_ritz — the
    # default TPU matmul precision is bf16 inputs)
    with jax.default_matmul_precision("float32"):
        return vals, q.T @ u


def sparse_diffusion_features(
    op: SparseOp, x: jnp.ndarray, dists: tuple[int, ...]
) -> jnp.ndarray:
    """``[S^t x for t in dists]`` stacked ``[len(dists), N, F]`` —
    the sparse analog of `ops.poly.diffusion_features_at`."""
    if not dists:
        return jnp.zeros((0,) + x.shape, x.dtype)
    outs = []
    cur = x
    for t in range(1, max(dists) + 1):
        cur = spmv(op, cur)
        if t in dists:
            outs.append(cur)
    return jnp.stack(outs)
