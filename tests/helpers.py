"""Shared test fixtures: random molecular-graph batches."""

import jax.numpy as jnp
import numpy as np

from lanczosnet_tpu.core.graph_batch import GraphBatch, batch_graphs
from lanczosnet_tpu.ops.lanczos import batched_lanczos_ritz
from lanczosnet_tpu.ops.normalize import build_operator_stack

NUM_TASK = 4
NUM_EDGE = 2  # raw edge types -> 3 operator channels


def random_graphs(rng, num, n_lo=4, n_hi=10):
    graphs = []
    for _ in range(num):
        n = int(rng.integers(n_lo, n_hi + 1))
        at = rng.integers(1, 6, size=n).astype(np.int32)
        adj = np.zeros((NUM_EDGE, n, n), np.float32)
        for e in range(NUM_EDGE):
            a = (rng.random((n, n)) < 0.4).astype(np.float32)
            a = np.triu(a, 1)
            adj[e] = a + a.T
        # ensure connectivity of channel union: chain
        for i in range(n - 1):
            adj[0, i, i + 1] = adj[0, i + 1, i] = 1.0
        graphs.append(
            {
                "atom_type": at,
                "adj": adj,
                "label": rng.standard_normal(NUM_TASK).astype(np.float32),
            }
        )
    return graphs


def make_batch(
    rng,
    num=4,
    n_max=12,
    with_ritz=False,
    k=6,
    with_cluster=False,
    operator_kind="sym",
    graphs=None,
):
    graphs = graphs if graphs is not None else random_graphs(rng, num)
    host = batch_graphs(graphs, n_max)
    mask = jnp.asarray(host["mask"])
    ops = build_operator_stack(jnp.asarray(host["adj"]), mask, kind=operator_kind)
    ritz_val = ritz_vec = cluster = None
    if with_ritz:
        ritz_val, ritz_vec = batched_lanczos_ritz(ops[:, 0], mask, k)
    if with_cluster:
        cluster = jnp.asarray(
            (np.arange(n_max)[None, :] % 2 * host["mask"]).astype(np.int32)
        )
    return GraphBatch(
        atom_type=jnp.asarray(host["atom_type"]),
        node_feat=jnp.asarray(host["node_feat"]),
        ops=ops,
        mask=mask,
        label=jnp.asarray(host["label"]),
        ritz_val=ritz_val,
        ritz_vec=ritz_vec,
        cluster=cluster,
    )
