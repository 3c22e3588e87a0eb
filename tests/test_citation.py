"""Full-graph citation path: generator, packing, node steps, runner,
node-axis sharding parity on the 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.data.citation import pack_citation, synthetic_citation_graph
from lanczosnet_tpu.models import build_model
from lanczosnet_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_full_graph
from lanczosnet_tpu.train.node_step import (
    make_node_eval_step,
    make_node_train_step,
    masked_ce_loss,
)
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.train.step import init_state
from lanczosnet_tpu.utils.config import AttrDict


def small_graph(seed=0):
    return synthetic_citation_graph("cora", seed=seed, scale=0.08)


def node_model(name="GCN", **kw):
    return build_model(
        {
            "name": name,
            "num_atom": 2,
            "num_task": 7,
            "hidden_dim": [32],
            "embed_dim": 32,
            "task": "node",
            **kw,
        }
    )


def test_generator_shapes_and_determinism():
    g1, g2 = small_graph(3), small_graph(3)
    np.testing.assert_array_equal(g1["adj"], g2["adj"])
    np.testing.assert_array_equal(g1["features"], g2["features"])
    n = g1["labels"].shape[0]
    assert g1["features"].shape[0] == n and g1["adj"].shape == (n, n)
    assert g1["train_mask"].sum() == 7 * 20
    assert not (g1["train_mask"] & g1["val_mask"]).any()
    assert not (g1["val_mask"] & g1["test_mask"]).any()
    # homophily: intra-class edge fraction well above class prior
    ii, jj = np.nonzero(np.triu(g1["adj"], 1))
    same = (g1["labels"][ii] == g1["labels"][jj]).mean()
    assert same > 0.5


def test_pack_citation_pads_and_masks():
    g = small_graph()
    batch, splits = pack_citation(g, pad_to=8, num_eig_vec=4)
    n = g["labels"].shape[0]
    n_pad = batch.mask.shape[1]
    assert n_pad % 8 == 0 and n_pad >= n
    assert batch.node_label.shape == (1, n_pad)
    assert batch.ritz_vec.shape == (1, n_pad, 4)
    assert float(batch.mask.sum()) == n
    for s in splits.values():
        assert s.shape == (1, n_pad)
        assert s[0, n:].sum() == 0


def test_pack_citation_gpnn_partition():
    """num_cluster attaches a Ritz-embedding partition: real nodes split
    into the requested id range, pads stay 0, both clusters non-empty,
    and the ids shard along the node axis like every other [1, N] leaf."""
    g = small_graph()
    batch, _ = pack_citation(g, pad_to=8, num_cluster=2)
    n = g["labels"].shape[0]
    cl = np.asarray(batch.cluster)
    assert cl.shape == (1, batch.mask.shape[1])
    assert set(np.unique(cl[0, :n])) == {0, 1}
    assert (cl[0, n:] == 0).all()
    # a spectral partition of a homophilous graph should not be
    # pathologically lopsided
    frac = (cl[0, :n] == 0).mean()
    assert 0.02 < frac < 0.98
    mesh = make_mesh(8)
    sb = shard_full_graph(batch, mesh, batch.mask.shape[1])
    np.testing.assert_array_equal(np.asarray(sb.cluster), cl)


def test_masked_ce_ignores_unsupervised():
    logits = jnp.zeros((1, 4, 3)).at[0, 3, 0].set(100.0)
    labels = jnp.array([[0, 1, 2, 1]])
    m = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    base = float(masked_ce_loss(logits, labels, m))
    assert base == pytest.approx(np.log(3.0), rel=1e-5)


def test_node_model_overfits_train_mask():
    g = small_graph()
    batch, splits = pack_citation(g, pad_to=8)
    batch = jax.tree.map(jnp.asarray, batch)
    model = node_model()
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-2}, 1)
    state = init_state(model, batch, tx, seed=0)
    step = make_node_train_step(model, tx)
    ev = make_node_eval_step(model)
    sup = jnp.asarray(splits["train"])
    for _ in range(60):
        state, loss = step(state, batch, sup)
    c, n, _ = ev(state.params, batch, sup)
    assert float(c) / float(n) > 0.95  # memorizes its 140 training nodes


def test_node_sharded_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8-device mesh")
    g = small_graph()
    batch, splits = pack_citation(g, pad_to=8)
    batch = jax.tree.map(jnp.asarray, batch)
    sup = jnp.asarray(splits["train"])
    model = node_model()
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-2}, 1)
    step = make_node_train_step(model, tx)

    s1 = init_state(model, batch, tx, seed=0)
    s1, loss1 = step(s1, batch, sup)

    mesh = make_mesh(8)
    n_pad = batch.mask.shape[1]
    sb = shard_full_graph(batch, mesh, n_pad)
    ssup = jax.device_put(
        sup,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data")),
    )
    s8 = init_state(model, batch, tx, seed=0)
    s8 = jax.tree.map(
        lambda x: jax.device_put(x, replicate_sharding(mesh)), s8
    )
    s8, loss8 = step(s8, sb, ssup)
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)


@pytest.mark.parametrize("name", ["GCN", "LanczosNet"])
def test_citation_runner_end_to_end(tmp_path, name):
    import pathlib

    kw = (
        {"num_eig_vec": 4, "short_diffusion_dist": [1, 2],
         "long_diffusion_dist": [3, 5]}
        if name == "LanczosNet"
        else {}
    )
    cfg = AttrDict.convert(
        {
            "exp_name": f"cit_{name}",
            "runner": "CitationRunner",
            "seed": 0,
            "save_dir": str(tmp_path / name),
            "dataset": {"source": "synthetic", "name": "cora", "scale": 0.08},
            "model": {"name": name, "hidden_dim": [32], "embed_dim": 32,
                      "task": "node", **kw},
            "train": {"optimizer": "Adam", "lr": 1e-2, "max_epoch": 30,
                      "patience": 30, "display_iter": 10, "num_devices": 8},
            "test": {},
        }
    )
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    res = runner.train()
    assert 0.0 <= res["test_acc"] <= 1.0
    assert res["best_val_acc"] > 1.0 / 7 + 0.05  # beats the class prior
    res2 = runner.test()
    assert res2["test_acc"] == pytest.approx(res["test_acc"], abs=1e-6)


def test_citation_runner_resume(tmp_path):
    """`train.is_resume` restarts the dense citation runner from the
    periodic `latest` snapshot (parity with the QM8 runner policy)."""
    import pathlib

    def cfg_for(max_epoch):
        return AttrDict.convert(
            {
                "exp_name": "cit_resume",
                "runner": "CitationRunner",
                "seed": 0,
                "save_dir": str(tmp_path / "run"),
                "dataset": {
                    "source": "synthetic", "name": "cora", "scale": 0.08,
                },
                "model": {"name": "GCN", "hidden_dim": [32], "embed_dim": 32,
                          "task": "node", "dropout": 0.0},
                "train": {"optimizer": "Adam", "lr": 1e-2,
                          "max_epoch": max_epoch, "patience": 1000,
                          "display_iter": 50, "snapshot_epoch": 5,
                          "is_resume": True},
                "test": {},
            }
        )

    pathlib.Path(tmp_path / "run").mkdir(parents=True, exist_ok=True)
    first = build_runner(cfg_for(10)).train()
    runner = build_runner(cfg_for(20))
    assert runner.ckpt.exists("latest")
    second = runner.train()
    meta = runner.ckpt.meta("latest") or {}
    assert int(meta.get("epoch", -1)) >= 9
    assert second["best_val_acc"] >= first["best_val_acc"] - 1e-6
