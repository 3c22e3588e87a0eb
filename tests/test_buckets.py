"""Size-bucketed packing + bucketed scanned training."""

import numpy as np
import pytest

from lanczosnet_tpu.data.buckets import bucket_of, pack_dataset_bucketed
from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.train.runner import build_runner
from tests.test_train import _runner_config


def test_bucket_of():
    assert bucket_of(5, [16, 32]) == 16
    assert bucket_of(16, [16, 32]) == 16
    assert bucket_of(17, [16, 32]) == 32
    with pytest.raises(ValueError, match="largest bucket"):
        bucket_of(40, [16, 32])


def test_pack_dataset_bucketed_partition_and_stats():
    graphs = synthetic_qm8_graphs(40, seed=0, n_lo=4, n_hi=24)
    packed, stats = pack_dataset_bucketed(
        graphs, bounds=[12, 24], standardize=True
    )
    assert set(packed) <= {12, 24}
    assert sum(len(d) for d in packed.values()) == 40
    for bound, d in packed.items():
        assert d.n_max == bound
        # every graph really fits its bucket and none fits a smaller one
        sizes = d.mask.sum(-1)
        assert sizes.max() <= bound
    assert (packed[12].mask.sum(-1) <= 12).all()
    if 24 in packed:
        assert (packed[24].mask.sum(-1) > 12).any()
    # shared standardization: stats fit on the union
    all_labels = np.stack([g["label"] for g in graphs])
    np.testing.assert_allclose(stats.mean, all_labels.mean(0), rtol=1e-5)
    # val/test reuse: same stats object passes through
    packed2, stats2 = pack_dataset_bucketed(
        graphs[:10], bounds=[12, 24], standardize=True, stats=stats
    )
    assert stats2 is stats


def test_runner_bucketed_end_to_end(tmp_path):
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "bucketed")
    cfg.dataset.buckets = [8, 12]
    cfg.dataset.num_train = 48
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    assert isinstance(runner.datasets["train"], dict)
    res = runner.train()
    assert np.isfinite(res["best_val_mae"])
    assert res["test_mae"] is not None
    res2 = runner.test()
    assert np.isfinite(res2["test_mae"])


def test_runner_bucketed_rejects_per_step(tmp_path):
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "b2")
    cfg.dataset.buckets = [8, 12]
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    assert runner._scan_mode()  # buckets force the scanned trainer


def test_small_bucket_merged_upward():
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs

    graphs = synthetic_qm8_graphs(60, seed=1, n_lo=4, n_hi=24)
    packed, _ = pack_dataset_bucketed(
        graphs, bounds=[6, 24], min_count=32, standardize=True
    )
    # the tiny 6-bucket merges into 24; nothing is silently dropped
    assert sum(len(d) for d in packed.values()) == 60
    for d in packed.values():
        assert len(d) >= 32


def test_batch_size_exceeding_split_raises(tmp_path):
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "toosmall")
    cfg.dataset.num_train = 4
    cfg.train.batch_size = 16
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    with pytest.raises(ValueError, match="batch_size"):
        build_runner(cfg).train()


def test_runner_bucket_pair_end_to_end(tmp_path):
    """Mixed-size paired steps (train.bucket_pair): each update averages
    gradients from half-batches of two buckets — trains end-to-end and
    steps the optimizer the scheduled number of times."""
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "paired")
    cfg.dataset.buckets = [8, 12]
    cfg.dataset.num_train = 64
    cfg.train.batch_size = 16
    cfg.train.bucket_pair = True
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    res = runner.train()
    assert np.isfinite(res["best_val_mae"])
    res2 = runner.test()
    assert np.isfinite(res2["test_mae"])


def test_pair_epoch_matches_fullbatch_gradient():
    """One paired step with both halves drawn from the same data equals
    one plain step over the concatenated batch (same update math)."""
    import jax
    import jax.numpy as jnp
    import optax

    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
    from lanczosnet_tpu.models import build_model
    from lanczosnet_tpu.train.scan_epoch import (
        device_dataset,
        make_scan_pair_epoch,
        make_scan_train_epoch,
    )
    from lanczosnet_tpu.train.step import TrainState

    ds = pack_dataset(
        synthetic_qm8_graphs(8, seed=0, n_hi=10), n_max=12, standardize=True
    )
    data = device_dataset(ds)
    model = build_model(
        {"name": "GCN", "num_atom": 8, "num_task": 16,
         "hidden_dim": [16], "embed_dim": 16, "dropout": 0.0}
    )
    tx = optax.sgd(1e-2)
    batch0 = jax.tree.map(lambda x: x[:8], data)
    params = model.init(jax.random.PRNGKey(0), batch0)["params"]

    def fresh_state():
        # copies: both epoch fns donate their state buffers
        p = jax.tree.map(jnp.array, params)
        return TrainState(
            params=p, opt_state=tx.init(p),
            step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(7),
        )

    full = make_scan_train_epoch(model, tx)
    pair = make_scan_pair_epoch(model, tx)
    perm_full = jnp.arange(8, dtype=jnp.int32)[None, :]
    s1, l1 = full(fresh_state(), data, perm_full)
    s2, l2 = pair(
        fresh_state(), data, perm_full[:, :4], data, perm_full[:, 4:]
    )
    np.testing.assert_allclose(float(l1[0]), float(l2[0]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
