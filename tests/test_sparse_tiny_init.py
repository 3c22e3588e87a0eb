"""Tiny-graph flax init (SparseCitationRunner._init_args).

The runner initializes parameters on a 32-node ring twin instead of
the real graph: every param in the nine sparse families is drawn from
rng with a shape that depends only on feature dims, so the draws must
be BIT-identical to a full-graph `model.init` with the same rngs.
This is what lets `init_train_state` skip the full forward flax init
executes — at 10M nodes that forward was minutes of single-device
compute, kept an unsharded [N, F] + operator copy alive, and (mixed
with mesh-sharded Ritz extras) compiled a GSPMD resharding program
that tripped XLA:CPU's 40 s collective-rendezvous abort (the r5
mem_probe crash this guards against).
"""

import pathlib

import jax
import numpy as np
import pytest

from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import AttrDict

FAMILIES = [
    ("GCN", {}),
    ("ChebyNet", {"poly_order": 3}),
    ("GAT", {"num_head": 2}),
    ("DCNN", {"max_hop": 2}),
    ("GraphSAGE", {}),
    ("MPNN", {"num_prop": 2}),
    ("GPNN", {"num_partition": 2, "num_prop": 2}),
    ("LanczosNet", {"num_eig_vec": 6, "short_diffusion_dist": [1, 2],
                    "long_diffusion_dist": [3, 5]}),
    ("AdaLanczosNet", {"num_eig_vec": 6, "kernel_dim": 8,
                       "short_diffusion_dist": [1, 2],
                       "long_diffusion_dist": [3, 5]}),
]


def _runner(tmp_path, name, kw, extra_train=None, ndev=1):
    cfg = AttrDict.convert(
        {
            "exp_name": f"tiny_init_{name}",
            "runner": "SparseCitationRunner",
            "seed": 0,
            "save_dir": str(tmp_path / name),
            "dataset": {"source": "synthetic", "name": "cora",
                        "scale": 0.08},
            "model": {"name": name, "hidden_dim": [16], **kw},
            "train": {"optimizer": "Adam", "lr": 1e-2, "max_epoch": 2,
                      "patience": 4, "display_iter": 20,
                      "num_devices": ndev, **(extra_train or {})},
            "test": {},
        }
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    return build_runner(cfg)


@pytest.mark.parametrize("name,kw", FAMILIES,
                         ids=[n for n, _ in FAMILIES])
def test_tiny_init_params_bit_identical_to_full_graph(tmp_path, name, kw):
    runner = _runner(tmp_path, name, kw)
    tx, _ = build_optimizer(runner.config.train, 1)
    tiny = runner.init_train_state(tx).params

    # full-graph init with the exact rngs init_train_state uses
    rng = jax.random.PRNGKey(0)
    p_rng, d_rng, _ = jax.random.split(rng, 3)
    extras = tuple(runner.extras) if runner.extras is not None else ()
    full = runner.model.init(
        {"params": p_rng, "dropout": d_rng},
        runner.x, runner.op, *extras, deterministic=True,
    )["params"]

    tiny_leaves = jax.tree.leaves(tiny)
    full_leaves = jax.tree.leaves(full)
    assert jax.tree.structure(tiny) == jax.tree.structure(full)
    for a, b in zip(tiny_leaves, full_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiny_init_on_node_ring_mesh(tmp_path):
    """init_train_state on a node-ring-sharded LanczosNet: params come
    out replicated over the mesh without executing any full-graph
    program (the crash-shaped composition, at test scale)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    runner = _runner(
        tmp_path, "LanczosNet",
        {"num_eig_vec": 6, "short_diffusion_dist": [1, 2],
         "long_diffusion_dist": [3, 5]},
        extra_train={"shard": "nodes_ring"}, ndev=8,
    )
    tx, _ = build_optimizer(runner.config.train, 1)
    state = runner.init_train_state(tx)
    for leaf in jax.tree.leaves(state.params):
        assert bool(np.all(np.isfinite(np.asarray(leaf))))
    # no full-size unsharded twins survive construction (memory
    # contract: only GPNN keeps an unsharded operator, for its
    # host-side spectral partition)
    assert not hasattr(runner, "init_x")
    assert not hasattr(runner, "init_op")
