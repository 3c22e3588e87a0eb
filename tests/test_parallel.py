"""Mesh data-parallel tests on the forced-8-device CPU mesh
(SURVEY.md §4: the TPU-world fake-backend analog)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the forced 8-device CPU mesh"
)


def test_mesh_and_batch_sharding():
    mesh = make_mesh(8)
    assert mesh.size == 8
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_train_step_matches_single_device():
    """DP over 8 devices must give the same loss/params as 1 device."""
    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.step import init_state, make_train_step
    from tests.test_train import tiny_batch, tiny_model

    model = tiny_model()
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    step = make_train_step(model, tx)
    batch = jax.tree.map(jnp.asarray, tiny_batch(num=16, n_max=10))
    valid = jnp.ones(16)

    # single device
    s1 = init_state(model, batch, tx, seed=0)
    s1, loss1 = step(s1, batch, valid)

    # 8-device mesh
    mesh = make_mesh(8)
    bsh, rsh = batch_sharding(mesh), replicate_sharding(mesh)
    sb = shard_batch(batch, mesh)
    sv = jax.device_put(valid, bsh)
    s8 = init_state(model, batch, tx, seed=0)
    s8 = jax.tree.map(lambda x: jax.device_put(x, rsh), s8)
    s8, loss8 = step(s8, sb, sv)

    assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        jax.device_get(s1.params),
        jax.device_get(s8.params),
    )


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_device_shuffle_epochs_mesh_matches_single_device():
    """train.device_shuffle under the 8-device DP mesh: the on-device
    permutation is key-deterministic and replicated before the batch-
    axis sharding constraint, so grouped-epoch losses/params must match
    the single-device run bit-for-bit up to reduction order."""
    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.scan_epoch import (
        device_dataset,
        make_scan_train_epochs,
    )
    from lanczosnet_tpu.train.step import init_state
    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
    from tests.test_train import tiny_model

    num, bs, epochs = 32, 16, 2
    graphs = synthetic_qm8_graphs(num, seed=0, n_lo=4, n_hi=8)
    ds = pack_dataset(graphs, n_max=10, num_eig_vec=4, standardize=True)
    model = tiny_model("LanczosNet", num_eig_vec=4,
                       short_diffusion_dist=[1, 2],
                       long_diffusion_dist=[3, 5])
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    key = jax.random.PRNGKey(11)

    # single device
    data1 = device_dataset(ds)
    batch0 = jax.tree.map(lambda x: x[:bs], data1)
    s1 = init_state(model, batch0, tx, seed=0)
    fn1 = make_scan_train_epochs(
        model, tx, num_graphs=num, batch_size=bs, epochs=epochs
    )
    s1, l1, _ = fn1(s1, data1, key)

    # 8-device mesh
    mesh = make_mesh(8)
    rsh = replicate_sharding(mesh)
    psh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")
    )
    data8 = device_dataset(ds, rsh)
    s8 = init_state(model, batch0, tx, seed=0)
    s8 = jax.tree.map(lambda x: jax.device_put(x, rsh), s8)
    fn8 = make_scan_train_epochs(
        model, tx, num_graphs=num, batch_size=bs, epochs=epochs,
        perm_sharding=psh,
    )
    s8, l8, _ = fn8(s8, data8, key)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        jax.device_get(s1.params),
        jax.device_get(s8.params),
    )


def test_bf16_model_under_dp_and_tp_mesh():
    """model.dtype: bfloat16 composes with the mesh modes: the DP-
    sharded bf16 step matches the single-device bf16 step, and the
    tp-tiled bf16 step compiles and stays finite (mixed activation
    dtype under GSPMD weight sharding is a realistic breakage surface)."""
    from lanczosnet_tpu.parallel.mesh import make_mesh2d, tp_state_sharding
    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.step import init_state, make_train_step
    from tests.test_train import tiny_batch, tiny_model

    model = tiny_model("LanczosNet", num_eig_vec=4,
                       short_diffusion_dist=[1, 2],
                       long_diffusion_dist=[3, 5], dtype="bf16")
    assert model.dtype == jnp.bfloat16
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    step = make_train_step(model, tx)
    batch = jax.tree.map(jnp.asarray, tiny_batch(num=16, n_max=10, num_eig_vec=4))
    valid = jnp.ones(16)

    s1 = init_state(model, batch, tx, seed=0)
    s1, loss1 = step(s1, batch, valid)

    mesh = make_mesh(8)
    bsh, rsh = batch_sharding(mesh), replicate_sharding(mesh)
    s8 = init_state(model, batch, tx, seed=0)
    s8 = jax.tree.map(lambda x: jax.device_put(x, rsh), s8)
    s8, loss8 = step(s8, shard_batch(batch, mesh), jax.device_put(valid, bsh))
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)

    # tp=4: feature-sharded f32 weights feeding bf16 compute
    mesh2 = make_mesh2d(2, 4)
    stp = init_state(model, batch, tx, seed=0)
    shardings = tp_state_sharding(stp, mesh2)
    stp = jax.tree.map(jax.device_put, stp, shardings)
    btp = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh2, jax.sharding.PartitionSpec("data"))),
        batch,
    )
    vtp = jax.device_put(valid, jax.sharding.NamedSharding(
        mesh2, jax.sharding.PartitionSpec("data")))
    stp, loss_tp = step(stp, btp, vtp)
    assert float(loss_tp) == pytest.approx(float(loss1), rel=1e-4)
