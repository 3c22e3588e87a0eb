"""Full-graph citation datasets (Cora / Citeseer / Pubmed shapes).

The extension family named in BASELINE.json ("Full-graph citation
benchmarks … single large sparse graph"): semi-supervised node
classification on ONE graph, Planetoid protocol (20 labeled nodes per
class for training, 500 validation, 1000 test). No network access on
this box, so two sources:

1. :func:`synthetic_citation_graph` — deterministic stochastic-block-
   model graph + class-correlated sparse bag-of-words features at the
   real datasets' shape points (or scaled via ``scale`` for tests).
2. :func:`import_planetoid` — reads the classic ``ind.<name>.{x,y,tx,
   ty,allx,ally,graph,test.index}`` files when a user supplies them.

The graph becomes a B=1 `GraphBatch` (node axis padded to a mesh-
divisible size) so all nine models run on it unchanged with
``task: node``; split masks ride alongside, not inside, the batch.
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.ops.normalize import build_operator_stack

# (num_nodes, feat_dim, num_class, avg_degree) of the real datasets
PRESETS = {
    "cora": (2708, 1433, 7, 3.9),
    "citeseer": (3327, 3703, 6, 2.8),
    "pubmed": (19717, 500, 3, 4.5),
}


def synthetic_citation_graph(
    name: str = "cora",
    seed: int = 0,
    scale: float = 1.0,
    feat_density: float = 0.015,
) -> dict:
    """SBM + class-feature-cluster stand-in for a Planetoid dataset.

    Returns ``{features [N,F] f32, labels [N] i32, adj [N,N] f32,
    train_mask/val_mask/test_mask [N] bool, num_class}``.
    """
    n0, f, c, avg_deg = PRESETS[name]
    n = max(c * 25, int(n0 * scale))
    f = max(16, int(f * min(1.0, scale * 2)))
    rng = np.random.Generator(np.random.Philox(seed))

    labels = rng.integers(0, c, size=n).astype(np.int32)
    # SBM edge probabilities: most edges intra-class
    p_in = avg_deg * 0.75 / (n / c)
    p_out = avg_deg * 0.25 / (n - n / c)
    same = labels[:, None] == labels[None, :]
    prob = np.where(same, p_in, p_out)
    upper = np.triu(rng.random((n, n)) < prob, 1)
    adj = (upper | upper.T).astype(np.float32)
    np.fill_diagonal(adj, 0.0)

    # class centroids in sparse random directions + per-node sparse noise
    centroids = (rng.random((c, f)) < feat_density * 3).astype(np.float32)
    noise = (rng.random((n, f)) < feat_density).astype(np.float32)
    features = np.clip(centroids[labels] * (rng.random((n, f)) < 0.5) + noise,
                       0.0, 1.0).astype(np.float32)
    # row-normalize, Planetoid-style
    rs = features.sum(1, keepdims=True)
    features = features / np.maximum(rs, 1.0)

    train_mask = np.zeros(n, bool)
    for cls in range(c):
        idx = np.nonzero(labels == cls)[0]
        train_mask[rng.choice(idx, size=min(20, len(idx)), replace=False)] = True
    rest = np.nonzero(~train_mask)[0]
    rng.shuffle(rest)
    n_val = min(500, max(50, n // 5))
    n_test = min(1000, max(100, n // 3))
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:n_val]] = True
    test_mask[rest[n_val : n_val + n_test]] = True

    return {
        "features": features,
        "labels": labels,
        "adj": adj,
        "train_mask": train_mask,
        "val_mask": val_mask,
        "test_mask": test_mask,
        "num_class": c,
    }


def synthetic_citation_edges(
    n: int,
    num_class: int = 10,
    feat_dim: int = 256,
    avg_degree: float = 5.0,
    homophily: float = 0.75,
    seed: int = 0,
    feat_density: float = 0.02,
) -> dict:
    """O(E) SBM-like generator for LARGE graphs (the dense-probability
    generator above materializes an [N, N] matrix and stops scaling
    around Pubmed size). Returns the standard dict schema but with
    ``edges [E, 2]`` instead of a dense ``adj`` — consumed by the
    sparse path (`ops.sparse.sparse_sym_operator`)."""
    rng = np.random.Generator(np.random.Philox(seed))
    labels = rng.integers(0, num_class, size=n).astype(np.int32)
    by_class = [np.nonzero(labels == c)[0] for c in range(num_class)]

    m = int(n * avg_degree / 2)
    src = rng.integers(0, n, size=m)
    same = rng.random(m) < homophily
    dst = np.empty(m, np.int64)
    for c in range(num_class):
        pool = by_class[c]
        sel = same & (labels[src] == c)
        if sel.any() and len(pool):
            dst[sel] = pool[rng.integers(0, len(pool), size=int(sel.sum()))]
    rand_sel = ~same
    dst[rand_sel] = rng.integers(0, n, size=int(rand_sel.sum()))
    keep = src != dst
    edges = np.unique(
        np.sort(np.stack([src[keep], dst[keep]], 1), axis=1), axis=0
    )

    centroids = (rng.random((num_class, feat_dim)) < feat_density * 3).astype(
        np.float32
    )
    features = centroids[labels] * (
        rng.random((n, feat_dim)) < 0.5
    ) + (rng.random((n, feat_dim)) < feat_density)
    features = features.astype(np.float32)
    features /= np.maximum(features.sum(1, keepdims=True), 1.0)

    train_mask = np.zeros(n, bool)
    for c in range(num_class):
        pool = by_class[c]
        if len(pool):
            train_mask[
                rng.choice(pool, size=min(20, len(pool)), replace=False)
            ] = True
    rest = np.nonzero(~train_mask)[0]
    rng.shuffle(rest)
    # Planetoid-style 500/1000 val/test, scaled down so SMALL graphs
    # still get a non-empty test split (fixed cutoffs left test empty
    # below ~560 nodes and silently reported 0.0 accuracy)
    n_val = min(500, max(1, len(rest) // 2))
    n_test = min(1000, len(rest) - n_val)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:n_val]] = True
    test_mask[rest[n_val : n_val + n_test]] = True
    return {
        "features": features,
        "labels": labels,
        "edges": edges.astype(np.int64),
        "train_mask": train_mask,
        "val_mask": val_mask,
        "test_mask": test_mask,
        "num_class": num_class,
    }


def import_planetoid(data_dir: str | Path, name: str) -> dict:
    """Load the classic Planetoid file set into the same dict schema."""
    data_dir = Path(data_dir)

    def load(part):
        with open(data_dir / f"ind.{name}.{part}", "rb") as fh:
            return pickle.load(fh, encoding="latin1")

    x, y, tx, ty, allx, ally, graph = (
        load(p) for p in ("x", "y", "tx", "ty", "allx", "ally", "graph")
    )
    test_idx = np.asarray(
        [
            int(line)
            for line in (data_dir / f"ind.{name}.test.index")
            .read_text()
            .split()
        ],
        np.int64,
    )

    def dense(m):
        return np.asarray(m.todense() if hasattr(m, "todense") else m, np.float32)

    allx, tx, x = dense(allx), dense(tx), dense(x)
    # Planetoid layout: nodes [0, allx.rows) are allx; test nodes occupy
    # the contiguous index range [min(test_idx), max(test_idx)] AFTER it,
    # but citeseer has isolated test nodes missing from tx — those get
    # zero features/labels (they also have no edges).
    n = max(allx.shape[0] + tx.shape[0], int(test_idx.max()) + 1, len(graph))
    features = np.zeros((n, allx.shape[1]), np.float32)
    features[: allx.shape[0]] = allx
    features[test_idx] = tx

    labels_oh = np.zeros((n, ally.shape[1]), np.float32)
    labels_oh[: ally.shape[0]] = ally
    labels_oh[test_idx] = ty
    labels = labels_oh.argmax(1).astype(np.int32)

    adj = np.zeros((n, n), np.float32)
    for i, nbrs in graph.items():
        for j in nbrs:
            if i != j and i < n and j < n:
                adj[i, j] = adj[j, i] = 1.0

    train_mask = np.zeros(n, bool)
    train_mask[: x.shape[0]] = True
    val_mask = np.zeros(n, bool)
    val_mask[x.shape[0] : x.shape[0] + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_idx] = True
    return {
        "features": features,
        "labels": labels,
        "adj": adj,
        "train_mask": train_mask,
        "val_mask": val_mask,
        "test_mask": test_mask,
        "num_class": int(labels_oh.shape[1]),
    }


def pack_citation(
    graph: dict,
    pad_to: int = 8,
    operator_kind: str = "sym",
    num_eig_vec: int = 0,
    num_cluster: int = 0,
) -> tuple[GraphBatch, dict]:
    """Citation dict → (B=1 GraphBatch, split masks padded alike).

    The node axis pads up to a multiple of ``pad_to`` so the full-graph
    batch shards evenly over a device mesh (parallel/mesh.py node-axis
    sharding). ``atom_type`` is 1 for every real node — citation nodes
    carry continuous features, the embedding is a shared bias.
    ``num_cluster > 0`` attaches a GPNN partition assignment
    (`data.partition.ritz_partition` — the Ritz-embedding clustering the
    sparse path also uses, so dense/sparse controls match).
    """
    n = graph["features"].shape[0]
    n_pad = -(-n // pad_to) * pad_to
    feats = np.zeros((1, n_pad, graph["features"].shape[1]), np.float32)
    feats[0, :n] = graph["features"]
    atom = np.zeros((1, n_pad), np.int32)
    atom[0, :n] = 1
    mask = np.zeros((1, n_pad), np.float32)
    mask[0, :n] = 1.0
    adj = np.zeros((1, 1, n_pad, n_pad), np.float32)
    adj[0, 0, :n, :n] = graph["adj"]
    ops = np.asarray(
        build_operator_stack(adj, mask, kind=operator_kind), np.float32
    )
    node_label = np.zeros((1, n_pad), np.int32)
    node_label[0, :n] = graph["labels"]

    ritz_val = ritz_vec = None
    if num_eig_vec > 0:
        from lanczosnet_tpu.ops.lanczos import batched_lanczos_ritz

        ritz_val, ritz_vec = batched_lanczos_ritz(
            ops[:, 0], mask, num_eig_vec
        )
        ritz_val, ritz_vec = np.asarray(ritz_val), np.asarray(ritz_vec)

    cluster = None
    if num_cluster > 0:
        from lanczosnet_tpu.data.partition import ritz_partition

        cluster = ritz_partition(ops[0, 0], mask[0], num_cluster)[None]

    batch = GraphBatch(
        atom_type=atom,
        node_feat=feats,
        ops=ops,
        mask=mask,
        label=np.zeros((1, 1), np.float32),  # unused in node task
        ritz_val=ritz_val,
        ritz_vec=ritz_vec,
        node_label=node_label,
        cluster=cluster,
    )
    splits = {}
    for s in ("train", "val", "test"):
        m = np.zeros((1, n_pad), np.float32)
        m[0, :n] = graph[f"{s}_mask"].astype(np.float32)
        splits[s] = m
    return batch, splits
