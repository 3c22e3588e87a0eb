"""Tensor parallelism (train.tp) on the forced-8-device CPU mesh.

2-D ``(data, model)`` mesh (`parallel/mesh.py:make_mesh2d`): every
weight matrix and its Adam moments are feature-sharded 1/tp per device
(`tp_state_sharding`), batches ride the data axis, and `jax.jit`/GSPMD
inserts the layer-boundary collectives. Contract: losses, gradients,
and updated params are identical to the single-device run (the sharding
is a layout, not a numerical change). No reference equivalent — the
upstream's only parallelism is replicate-everything DataParallel
(SURVEY.md §2.6); this is the TPU-native model-parallel axis.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh2d,
    shard_batch,
    tp_state_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the forced 8-device CPU mesh"
)


def _mesh_dp2_tp4():
    return make_mesh2d(4, 8)


def test_mesh2d_shape_and_axes():
    mesh = _mesh_dp2_tp4()
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[MODEL_AXIS] == 4
    with pytest.raises(ValueError):
        make_mesh2d(3, 8)


def test_tp_state_sharding_rule():
    mesh = _mesh_dp2_tp4()
    tree = {
        "kernel": jnp.zeros((16, 32)),   # last-axis sharded
        "bias": jnp.zeros((32,)),        # sharded
        "odd": jnp.zeros((16, 30)),      # 30 % 4 != 0 -> replicated
        "scalar": jnp.zeros(()),         # replicated
    }
    specs = tp_state_sharding(tree, mesh)
    assert specs["kernel"].spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert specs["bias"].spec == jax.sharding.PartitionSpec(MODEL_AXIS)
    assert specs["odd"].spec == jax.sharding.PartitionSpec()
    assert specs["scalar"].spec == jax.sharding.PartitionSpec()
    placed = jax.device_put(tree, specs)
    # per-device shard really is 1/tp of the feature axis
    shard = placed["kernel"].addressable_shards[0]
    assert shard.data.shape == (16, 8)


@pytest.mark.parametrize("model_name", ["GCN", "LanczosNet"])
def test_tp_train_step_matches_single_device(model_name):
    """dp=2 × tp=4 must reproduce the single-device loss AND params."""
    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.step import init_state, make_train_step
    from tests.test_train import tiny_batch, tiny_model

    kw = (
        {"num_eig_vec": 4, "short_diffusion_dist": [1, 2],
         "long_diffusion_dist": [3, 5]}
        if model_name == "LanczosNet"
        else {}
    )
    model = tiny_model(model_name, **kw)
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    step = make_train_step(model, tx)
    batch = jax.tree.map(
        jnp.asarray, tiny_batch(num=16, n_max=10, num_eig_vec=4)
    )
    valid = jnp.ones(16)

    s1 = init_state(model, batch, tx, seed=0)
    ref = s1
    for _ in range(2):
        ref, loss1 = step(ref, batch, valid)

    mesh = _mesh_dp2_tp4()
    sb = shard_batch(batch, mesh)
    sv = jax.device_put(valid, batch_sharding(mesh))
    stp = init_state(model, batch, tx, seed=0)
    stp = jax.device_put(stp, tp_state_sharding(stp, mesh))
    for _ in range(2):
        stp, loss_tp = step(stp, sb, sv)

    assert float(loss1) == pytest.approx(float(loss_tp), rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        jax.device_get(ref.params),
        jax.device_get(stp.params),
    )


def test_tp_runner_end_to_end(tmp_path):
    """`train.tp: 4` through the real runner (scanned-epoch default),
    including eval + checkpointing."""
    from lanczosnet_tpu.train.runner import build_runner
    from tests.test_train import _runner_config

    cfg = _runner_config(tmp_path, "LanczosNet", num_eig_vec=4,
                         short_diffusion_dist=[1, 2],
                         long_diffusion_dist=[3, 5])
    cfg.train.tp = 4
    runner = build_runner(cfg)
    assert runner.mesh.shape[MODEL_AXIS] == 4
    assert runner.dp * 4 == runner.mesh.size
    runner.train()
    res = runner.test()
    assert np.isfinite(res["test_mae"])
    # resume path: msgpack restore yields host arrays; the runner must
    # re-pin the tp layout before training on
    cfg.train.is_resume = True
    cfg.train.max_epoch = int(cfg.train.max_epoch) + 1
    runner2 = build_runner(cfg)
    runner2.train()
    res2 = runner2.test()
    assert np.isfinite(res2["test_mae"])
