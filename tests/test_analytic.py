"""Hand-computed forwards on a tiny graph (SURVEY.md §4: "each model's
forward vs a tiny hand-computed graph"). Parameters are injected so the
expected outputs are pencil-and-paper linear algebra."""

import numpy as np
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models import build_model
from lanczosnet_tpu.models.base import AttentionReadout, NodeEncoder
from lanczosnet_tpu.ops.normalize import build_operator_stack


def tiny_path_graph():
    """3-node path graph 0-1-2 (+1 padded node), one edge type."""
    adj = np.zeros((1, 1, 4, 4), np.float32)
    adj[0, 0, 0, 1] = adj[0, 0, 1, 0] = 1.0
    adj[0, 0, 1, 2] = adj[0, 0, 2, 1] = 1.0
    mask = np.asarray([[1.0, 1.0, 1.0, 0.0]], np.float32)
    ops = np.asarray(build_operator_stack(adj, jnp.asarray(mask)))
    return GraphBatch(
        atom_type=np.asarray([[1, 2, 1, 0]], np.int32),
        node_feat=np.zeros((1, 4, 0), np.float32),
        ops=ops,
        mask=mask,
        label=np.zeros((1, 1), np.float32),
    )


def test_operator_stack_path_graph_values():
    """D^{-1/2} A D^{-1/2} of the path: deg = [1, 2, 1]."""
    batch = tiny_path_graph()
    s = np.asarray(batch.ops[0, 0])
    r = 1.0 / np.sqrt(2.0)
    expect = np.zeros((4, 4), np.float32)
    expect[0, 1] = expect[1, 0] = r
    expect[1, 2] = expect[2, 1] = r
    np.testing.assert_allclose(s, expect, atol=1e-6)


def test_gcn_forward_hand_computed():
    """One GCN layer with identity-ish injected weights.

    h0 = onehot-embedding rows; msg = [S h0 ‖ S h0] (channel 0 = merged,
    channel 1 = the single edge type — identical here); layer input is
    [h0 ‖ msg]; Dense = identity on the first block, zero elsewhere, so
    h1 = relu(h0); readout gate σ(0)=0.5, out = Σ mask · 0.5 · (W h1).
    """
    batch = tiny_path_graph()
    model = build_model(
        {
            "name": "GCN",
            "num_atom": 3,
            "num_task": 2,
            "hidden_dim": [3],
            "embed_dim": 3,
            "dropout": 0.0,
        }
    )
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)[
        "params"
    ]
    params = jax.tree.map(np.asarray, params)
    # embedding = identity over atom ids
    params["NodeEncoder_0"]["atom_embed"]["embedding"] = np.eye(3, dtype=np.float32)
    # Dense(9 -> 3): pick out the first block (the untouched h)
    w = np.zeros((9, 3), np.float32)
    w[:3, :3] = np.eye(3)
    params["layer_0"]["kernel"] = w
    params["layer_0"]["bias"] = np.zeros(3, np.float32)
    ro = params["AttentionReadout_0"]
    ro["att_gate"]["kernel"] = np.zeros((3, 1), np.float32)  # gate = 0.5
    ro["att_gate"]["bias"] = np.zeros(1, np.float32)
    w_out = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
    ro["out_proj"]["kernel"] = w_out
    ro["out_proj"]["bias"] = np.zeros(2, np.float32)

    pred = np.asarray(
        model.apply({"params": params}, batch, deterministic=True)
    )
    # h1 = relu(h0) = one-hot rows for atoms [1, 2, 1]; padded row masked
    h1 = np.zeros((4, 3), np.float32)
    h1[0, 1] = h1[2, 1] = 1.0  # atom id 1
    h1[1, 2] = 1.0  # atom id 2
    expect = 0.5 * (h1 @ w_out).sum(0, keepdims=True)
    np.testing.assert_allclose(pred, expect, atol=1e-5)


def test_attention_readout_hand_computed():
    h = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])  # node 2 padded out
    module = AttentionReadout(num_task=1)
    params = jax.tree.map(
        np.asarray, module.init(jax.random.PRNGKey(0), h, mask)["params"]
    )
    params["att_gate"]["kernel"] = np.asarray([[10.0], [10.0]], np.float32)
    params["att_gate"]["bias"] = np.zeros(1, np.float32)  # gate ≈ 1
    params["out_proj"]["kernel"] = np.asarray([[1.0], [1.0]], np.float32)
    params["out_proj"]["bias"] = np.zeros(1, np.float32)
    out = np.asarray(module.apply({"params": params}, h, mask))
    # sums rows 0 and 1 only: (1+2) + (3+4) = 10, gate ≈ 1
    np.testing.assert_allclose(out, [[10.0]], rtol=1e-4)


def test_node_encoder_masks_padding():
    batch = tiny_path_graph()
    enc = NodeEncoder(num_atom=3, embed_dim=4)
    params = enc.init(jax.random.PRNGKey(0), batch)["params"]
    h = np.asarray(enc.apply({"params": params}, batch))
    assert np.abs(h[0, 3]).max() == 0.0  # padded node exactly zero
    assert np.abs(h[0, :3]).max() > 0.0
