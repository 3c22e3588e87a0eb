"""Spectral graph partitioning for GPNN — host-side, one-off.

Replaces reference `utils/spectral_graph_partition.py` (SURVEY.md §2.1):
the reference spectrally clusters each graph into subgraphs + a cut
graph and builds an explicit propagation schedule. Our GPNN consumes
only a per-node cluster id (`models/gpnn.py` turns it into intra/inter
pair masks on device), so the host side reduces to classic spectral
clustering: Fiedler-style embedding from the bottom eigenvectors of the
normalized Laplacian, then a tiny k-means.

Pure numpy; runs once at pack time (data/dataset.py), never in the
training hot path.
"""

from __future__ import annotations

import numpy as np


def _kmeans(x: np.ndarray, k: int, iters: int = 25, seed: int = 0) -> np.ndarray:
    """Tiny deterministic k-means. x [n, d] → labels [n]."""
    n = x.shape[0]
    rng = np.random.Generator(np.random.Philox(seed))
    if n <= k:
        return np.arange(n) % k
    centers = x[rng.choice(n, size=k, replace=False)]
    labels = np.zeros(n, np.int64)
    for _ in range(iters):
        d2 = ((x[:, None] - centers[None]) ** 2).sum(-1)
        new = d2.argmin(-1)
        if (new == labels).all():
            break
        labels = new
        for c in range(k):
            pts = x[labels == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return labels


def spectral_partition(
    op: np.ndarray, mask: np.ndarray, num_cluster: int
) -> np.ndarray:
    """Cluster one graph's real nodes into ``num_cluster`` groups.

    Args:
      op: [N, N] symmetric normalized operator (channel 0 of the stack;
        its top eigenvectors are the bottom eigenvectors of L = I - S).
      mask: [N] node mask.

    Returns:
      [N] int32 cluster ids; padded nodes get 0 (they're masked out of
      every pair mask downstream anyway).
    """
    n_real = int(mask.sum())
    out = np.zeros(op.shape[0], np.int32)
    if n_real == 0 or num_cluster <= 1:
        return out
    sub = op[:n_real, :n_real]
    w, v = np.linalg.eigh(0.5 * (sub + sub.T))
    # top eigenvectors of S == smoothest modes of the Laplacian
    emb = v[:, -min(num_cluster, n_real) :]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    out[:n_real] = _kmeans(emb, num_cluster).astype(np.int32)
    return out


def sparse_spectral_partition(
    op, num_cluster: int, k: int | None = None, seed: int = 0
) -> np.ndarray:
    """Cluster a COO-operator graph — the sparse-path analog of
    :func:`spectral_partition` for `models/sparse_nodes.py:SparseGPNN`.

    The embedding comes from the operator's top Ritz vectors
    (`ops.sparse.sparse_lanczos_ritz` — the same K-step machinery the
    sparse LanczosNet uses, so no dense [N, N] is ever formed), row-
    normalized, then the same tiny k-means. Returns [N] int32 ids.
    """
    from lanczosnet_tpu.ops.sparse import sparse_lanczos_ritz

    if num_cluster <= 1:
        return np.zeros(op.n, np.int32)
    k = k if k is not None else max(2 * num_cluster, 8)
    k = min(k, op.n)
    _, vecs = sparse_lanczos_ritz(op, k)
    emb = np.asarray(vecs)[:, -min(num_cluster, k):]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return _kmeans(emb, num_cluster, seed=seed).astype(np.int32)


def spectral_partition_batch(
    ops0: np.ndarray, mask: np.ndarray, num_cluster: int
) -> np.ndarray:
    """Vectorize :func:`spectral_partition` over a graph list. [G,N,N] → [G,N]."""
    return np.stack(
        [spectral_partition(ops0[g], mask[g], num_cluster) for g in range(len(ops0))]
    )


def ritz_partition(
    op: np.ndarray, mask: np.ndarray, num_cluster: int,
    k: int | None = None, seed: int = 0,
) -> np.ndarray:
    """Partition ONE large dense-operator graph via its Ritz embedding.

    `spectral_partition`'s full eigh is O(N³) host flops — fine at QM8's
    N≤128, minutes at citation scale. This variant embeds nodes with the
    operator's top-K Ritz vectors (`ops.lanczos.batched_lanczos_ritz`,
    device-accelerated) — the SAME embedding `sparse_spectral_partition`
    uses for `SparseGPNN`, so dense-vs-sparse GPNN comparisons on the
    same graph cluster the same way. Returns [N] int32 ids (0 on pads).
    """
    if num_cluster <= 1:
        return np.zeros(op.shape[0], np.int32)
    from lanczosnet_tpu.ops.lanczos import batched_lanczos_ritz

    n_real = int(mask.sum())
    k = k if k is not None else max(2 * num_cluster, 8)
    k = min(k, max(n_real, 1))
    _, vecs = batched_lanczos_ritz(
        np.asarray(op, np.float32)[None], np.asarray(mask, np.float32)[None], k
    )
    emb = np.asarray(vecs)[0][:, -min(num_cluster, k):]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    out = np.zeros(op.shape[0], np.int32)
    out[:n_real] = _kmeans(emb[:n_real], num_cluster, seed=seed).astype(np.int32)
    return out
