"""Scanned-epoch (device-resident) training path vs the per-step path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.data.dataset import pack_dataset
from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.scan_epoch import (
    device_dataset,
    gather_batch,
    make_scan_eval,
    make_scan_train_epoch,
)
from lanczosnet_tpu.train.step import init_state, make_eval_step, make_train_step
from tests.test_train import _runner_config, tiny_model


def make_ds(num=24, n_max=10):
    return pack_dataset(
        synthetic_qm8_graphs(num, seed=0, n_lo=4, n_hi=n_max - 2),
        n_max=n_max,
        standardize=True,
    )


def test_gather_batch_matches_host_slice():
    ds = make_ds()
    data = device_dataset(ds)
    idx = jnp.asarray([3, 7, 1, 3])
    got = gather_batch(data, idx)
    want = ds.slice_batch(np.asarray([3, 7, 1, 3]))
    np.testing.assert_allclose(np.asarray(got.ops), want.ops)
    np.testing.assert_array_equal(np.asarray(got.atom_type), want.atom_type)


def test_scan_epoch_matches_per_step_sequence():
    """Same batch sequence → identical params/losses as the per-step path."""
    ds = make_ds()
    model = tiny_model()
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    data = device_dataset(ds)
    perm = np.arange(24, dtype=np.int32).reshape(3, 8)

    # scanned
    s1 = init_state(model, gather_batch(data, jnp.asarray(perm[0])), tx, seed=0)
    epoch_fn = make_scan_train_epoch(model, tx)
    s1, losses = epoch_fn(s1, data, jnp.asarray(perm))

    # per-step with the same batches
    s2 = init_state(model, gather_batch(data, jnp.asarray(perm[0])), tx, seed=0)
    step = make_train_step(model, tx)
    step_losses = []
    for row in perm:
        batch = jax.tree.map(jnp.asarray, ds.slice_batch(row))
        s2, loss = step(s2, batch, jnp.ones(8))
        step_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(step_losses), rtol=1e-5, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        jax.device_get(s1.params),
        jax.device_get(s2.params),
    )


def test_scan_eval_matches_per_step_eval():
    ds = make_ds()
    model = tiny_model()
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    data = device_dataset(ds)
    state = init_state(model, gather_batch(data, jnp.arange(8)), tx, seed=0)

    scan_eval = make_scan_eval(model)
    idx = np.zeros((3, 8), np.int32)
    valid = np.zeros((3, 8), np.float32)
    idx.reshape(-1)[:24] = np.arange(24)
    valid.reshape(-1)[:24] = 1.0
    esum, count = scan_eval(state.params, data, jnp.asarray(idx), jnp.asarray(valid))

    ev = make_eval_step(model)
    ref_sum, ref_count = 0.0, 0.0
    for row, v in zip(idx, valid):
        batch = jax.tree.map(jnp.asarray, ds.slice_batch(row))
        e, c = ev(state.params, batch, jnp.asarray(v))
        ref_sum = ref_sum + np.asarray(e)
        ref_count += float(c)
    np.testing.assert_allclose(np.asarray(esum), ref_sum, rtol=1e-5)
    assert float(count) == ref_count == 24.0


@pytest.mark.parametrize("scan", [True, False])
def test_runner_both_paths(tmp_path, scan):
    import pathlib

    from lanczosnet_tpu.train.runner import build_runner

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / f"scan_{scan}")
    cfg.train.scan_epoch = scan
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    res = build_runner(cfg).train()
    assert np.isfinite(res["best_val_mae"])
    assert res["test_mae"] is not None


def test_shuffle_epoch_debug_bounds_tripwire(monkeypatch):
    """Default 'clip' gather remaps an out-of-bounds index to the last
    row (hot path, in-bounds by construction); LANCZOSNET_DEBUG_BOUNDS
    restores the 'fill' NaN tripwire so a new caller's index bug
    surfaces loudly instead of silently training on the wrong graph
    (advisor r4)."""
    from lanczosnet_tpu.train.scan_epoch import shuffle_epoch

    ds = make_ds(num=8)
    data = device_dataset(ds)
    bad = jnp.full((2, 4), 99, jnp.int32)  # 8-row table: way OOB

    out = shuffle_epoch(data, bad, steps=2, batch_size=4)
    np.testing.assert_allclose(  # clip → every row is the last graph
        np.asarray(out.ops), np.broadcast_to(np.asarray(data.ops)[-1], (2, 4) + data.ops.shape[1:])
    )

    monkeypatch.setenv("LANCZOSNET_DEBUG_BOUNDS", "1")
    out = shuffle_epoch(data, bad, steps=2, batch_size=4)
    assert np.isnan(np.asarray(out.ops)).all()

    good = jnp.tile(jnp.arange(8, dtype=jnp.int32), 1).reshape(2, 4)
    out = shuffle_epoch(data, good, steps=2, batch_size=4)
    np.testing.assert_allclose(
        np.asarray(out.ops), np.asarray(data.ops).reshape((2, 4) + data.ops.shape[1:])
    )
