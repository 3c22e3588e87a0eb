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
from lanczosnet_tpu.ops.lanczos import lanczos_tridiag_matvec, tridiag_matrix


@flax.struct.dataclass
class SparseOp:
    """Symmetric normalized graph operator in COO form.

    Attributes:
      row: ``[E]`` int32 edge sources (both directions present).
      col: ``[E]`` int32 edge destinations.
      val: ``[E]`` float32 normalized weights.
      n: number of nodes — static pytree metadata (output shapes depend
        on it, so it must stay a concrete Python int under jit).
    """

    row: jnp.ndarray
    col: jnp.ndarray
    val: jnp.ndarray
    n: int = flax.struct.field(pytree_node=False)


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
    return SparseOp(
        row=jnp.asarray(row, jnp.int32),
        col=jnp.asarray(col, jnp.int32),
        val=jnp.asarray(val),
        n=n,
    )


def spmv(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """``S @ x`` for x ``[N]`` or ``[N, F]`` via gather + segment-sum."""
    msg = op.val[:, None] * x[op.col] if x.ndim == 2 else op.val * x[op.col]
    return jax.ops.segment_sum(msg, op.row, num_segments=op.n)


@partial(jax.jit, static_argnames=("k",))
def sparse_lanczos_ritz(
    op: SparseOp, k: int, eps: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ritz pairs of a sparse operator — the dense pipeline's
    `lanczos_ritz`, with the matvec running over COO edges.

    Returns ``(ritz_val [k], ritz_vec [N, k])``.
    """
    mask = jnp.ones((op.n,), jnp.float32)
    alphas, betas, q = lanczos_tridiag_matvec(
        lambda v: spmv(op, v), mask, k, eps
    )
    t = tridiag_matrix(alphas, betas)
    vals, u = eigh_dispatch(t)
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
