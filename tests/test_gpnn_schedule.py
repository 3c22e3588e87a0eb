"""GPNN propagation-schedule semantics (VERDICT round-1 #4).

Analytic check on a 2-partition line graph 0-1-2-3 with clusters
[0,0,1,1]: the only cross-partition edge is 1-2, so the cut graph's
node set is {1, 2}.

- with ``num_cut_prop=0`` information provably CANNOT cross the
  partition: the Jacobian of node 3's output w.r.t. node 0's input
  features is exactly zero, however many layers/steps run;
- with the default schedule it is nonzero;
- with ``num_intra_prop=0`` (cut steps only) interior nodes pass
  through unchanged, so node 0's output cannot see node 3 while the
  boundary pair 1↔2 does exchange information.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.gpnn import GPNN


def line_graph_batch():
    n = 4
    adj = np.zeros((n, n), np.float32)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[i, j] = adj[j, i] = 1.0
    deg = adj.sum(1)
    op = adj / np.sqrt(np.outer(deg, deg))
    return GraphBatch(
        atom_type=jnp.ones((1, n), jnp.int32),
        node_feat=jnp.zeros((1, n, 2), jnp.float32),
        ops=jnp.asarray(op[None, None]),
        mask=jnp.ones((1, n), jnp.float32),
        label=jnp.zeros((1, 2), jnp.float32),
        cluster=jnp.asarray([[0, 0, 1, 1]], jnp.int32),
    )


def node_jacobian(model, batch, out_node, in_node):
    """max |d out[out_node] / d node_feat[in_node]|"""
    params = model.init(jax.random.PRNGKey(0), batch)

    def f(x):
        return model.apply(params, batch.replace(node_feat=x))[0, out_node]

    jac = jax.jacobian(f)(batch.node_feat)  # [C, 1, N, F]
    return float(jnp.max(jnp.abs(jac[:, 0, in_node])))


def make(num_prop=2, num_intra_prop=1, num_cut_prop=1):
    return GPNN(
        num_atom=4,
        embed_dim=8,
        hidden_dim=(8, 8),
        num_task=2,
        num_prop=num_prop,
        num_intra_prop=num_intra_prop,
        num_cut_prop=num_cut_prop,
        task="node",
    )


def test_no_cut_steps_cannot_cross_partition():
    batch = line_graph_batch()
    j = node_jacobian(make(num_cut_prop=0), batch, out_node=3, in_node=0)
    assert j == 0.0
    # sanity: within the partition information does flow
    j_intra = node_jacobian(make(num_cut_prop=0), batch, out_node=1, in_node=0)
    assert j_intra > 0.0


def test_cut_steps_move_information_across():
    batch = line_graph_batch()
    j = node_jacobian(make(), batch, out_node=3, in_node=0)
    assert j > 1e-8


def test_cut_graph_is_boundary_node_set():
    """Cut-only schedule: interior nodes pass through cut steps
    unchanged, boundary nodes (1,2) exchange across the cut edge."""
    batch = line_graph_batch()
    model = make(num_prop=1, num_intra_prop=0, num_cut_prop=2)
    # interior node 0 never updates -> cannot see anything else
    assert node_jacobian(model, batch, out_node=0, in_node=3) == 0.0
    assert node_jacobian(model, batch, out_node=0, in_node=1) == 0.0
    # boundary pair exchanges over the cut edge
    assert node_jacobian(model, batch, out_node=1, in_node=2) > 1e-8


def test_from_config_schedule_keys():
    cfg = {
        "num_atom": 4,
        "hidden_dim": [8],
        "num_task": 2,
        "num_prop": 3,
        "num_intra_prop": 2,
        "num_cut_prop": 1,
    }
    m = GPNN.from_config(cfg)
    assert (m.num_prop, m.num_intra_prop, m.num_cut_prop) == (3, 2, 1)


def test_single_cluster_degenerates_gracefully():
    batch = line_graph_batch().replace(cluster=None)
    model = make()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(np.asarray(out)).all()
