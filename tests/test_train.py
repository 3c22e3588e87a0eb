"""Training-stack tests: jitted step, overfit, checkpoint round-trip,
runner end-to-end, resume (SURVEY.md §4 integration plan)."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.data.dataset import pack_dataset
from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.models import build_model
from lanczosnet_tpu.train.checkpoint import Checkpointer
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.train.step import (
    init_state,
    make_eval_step,
    make_train_step,
    weighted_mae,
)
from lanczosnet_tpu.utils.config import AttrDict


def tiny_model(name="GCN", **kw):
    cfg = {
        "name": name,
        "num_atom": 8,
        "num_task": 16,
        "hidden_dim": [32, 32],
        "embed_dim": 32,
        **kw,
    }
    return build_model(cfg)


def tiny_batch(num=8, n_max=10, num_eig_vec=0):
    graphs = synthetic_qm8_graphs(num, seed=0, n_lo=4, n_hi=n_max - 2)
    ds = pack_dataset(graphs, n_max=n_max, num_eig_vec=num_eig_vec,
                      standardize=True)
    return ds.slice_batch(np.arange(num))


def test_weighted_mae_ignores_ghosts():
    pred = jnp.ones((4, 3))
    label = jnp.zeros((4, 3))
    valid = jnp.array([1.0, 1.0, 0.0, 0.0])
    assert float(weighted_mae(pred, label, valid)) == pytest.approx(1.0)
    # ghost rows with huge error change nothing
    pred2 = pred.at[2:].set(1e6)
    assert float(weighted_mae(pred2, label, valid)) == pytest.approx(1.0)


def test_overfit_two_graphs():
    """2-graph overfit (SURVEY.md §4): loss must collapse."""
    model = tiny_model()
    batch = tiny_batch(num=2, n_max=8)
    batch = jax.tree.map(jnp.asarray, batch)
    valid = jnp.ones(2)
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 3e-3}, 1)
    state = init_state(model, batch, tx, seed=0)
    step = make_train_step(model, tx)
    first = None
    for i in range(200):
        state, loss = step(state, batch, valid)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first, (first, float(loss))


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    batch = jax.tree.map(jnp.asarray, tiny_batch(num=4))
    valid = jnp.ones(4)
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    state = init_state(model, batch, tx, seed=0)
    step = make_train_step(model, tx)
    state, _ = step(state, batch, valid)

    ck = Checkpointer(tmp_path)
    ck.save("best", state, {"epoch": 0, "val_mae": 0.5})
    state2 = init_state(model, batch, tx, seed=99)  # different init
    state2 = ck.restore("best", state2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        jax.device_get(state.params),
        jax.device_get(state2.params),
    )
    assert int(state2.step) == 1
    assert ck.meta("best")["val_mae"] == 0.5
    # eval parity after restore
    ev = make_eval_step(model)
    e1, _ = ev(state.params, batch, valid)
    e2, _ = ev(state2.params, batch, valid)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6)


def _runner_config(tmp_path, model_name, **model_kw):
    return AttrDict.convert(
        {
            "exp_name": f"t_{model_name}",
            "runner": "QM8Runner",
            "seed": 0,
            "save_dir": str(tmp_path / model_name),
            "dataset": {
                "source": "synthetic",
                "n_max": 12,
                "num_atom": 8,
                "num_train": 32,
                "num_val": 16,
                "num_test": 16,
                "standardize": True,
            },
            "model": {
                "name": model_name,
                "hidden_dim": [32],
                "embed_dim": 32,
                **model_kw,
            },
            "train": {
                "optimizer": "Adam",
                "lr": 1e-3,
                "batch_size": 8,
                "max_epoch": 2,
                "display_iter": 100,
                "valid_epoch": 1,
                "shuffle": True,
            },
            "test": {},
        }
    )


@pytest.mark.parametrize(
    "name,kw",
    [
        ("GCN", {}),
        ("ChebyNet", {"poly_order": 3}),
        ("DCNN", {"max_hop": 3}),
        ("GAT", {"num_heads": 2}),
        ("GraphSAGE", {}),
        ("MPNN", {"num_prop": 2}),
        ("LanczosNet", {"num_eig_vec": 4, "short_diffusion_dist": [1, 2],
                        "long_diffusion_dist": [3, 5]}),
        ("AdaLanczosNet", {"num_eig_vec": 4, "short_diffusion_dist": [1, 2],
                           "long_diffusion_dist": [3, 5], "kernel_dim": 8}),
        ("GPNN", {"num_partition": 2}),
    ],
)
def test_runner_end_to_end(tmp_path, name, kw):
    import pathlib

    cfg = _runner_config(tmp_path, name, **kw)
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    result = runner.train()
    assert np.isfinite(result["best_val_mae"])
    assert result["test_mae"] is not None
    # test() path restores the best snapshot
    result2 = runner.test()
    assert result2["test_mae"] == pytest.approx(result["test_mae"], rel=1e-5)


def test_pack_cache_roundtrip(tmp_path, monkeypatch):
    """Second runner build with identical dataset fields must serve
    byte-identical packed splits from the pack cache; a different seed
    must repack into a different entry; pack_cache: false writes
    nothing."""
    import pathlib

    monkeypatch.setenv("LANCZOSNET_CACHE", str(tmp_path / "cache"))
    cfg = _runner_config(tmp_path, "LanczosNet", num_eig_vec=4,
                         short_diffusion_dist=[1], long_diffusion_dist=[2])
    r1 = build_runner(cfg)
    entries = list(pathlib.Path(tmp_path / "cache").rglob("*.npz"))
    assert len(entries) == 3  # train/val/test, one digest dir
    r2 = build_runner(cfg)
    for s in ("train", "val", "test"):
        a, b = r1.datasets[s], r2.datasets[s]
        np.testing.assert_array_equal(a.ops, b.ops)
        np.testing.assert_array_equal(a.label, b.label)
        np.testing.assert_array_equal(a.ritz_vec, b.ritz_vec)
        np.testing.assert_allclose(a.stats.mean, b.stats.mean)

    cfg2 = _runner_config(tmp_path, "LanczosNet", num_eig_vec=4,
                          short_diffusion_dist=[1], long_diffusion_dist=[2])
    cfg2.dataset.seed = 99
    build_runner(cfg2)
    assert len(list(pathlib.Path(tmp_path / "cache").rglob("*.npz"))) == 6

    cfg3 = _runner_config(tmp_path, "LanczosNet", num_eig_vec=4,
                          short_diffusion_dist=[1], long_diffusion_dist=[2])
    cfg3.dataset.seed = 123
    cfg3.dataset.pack_cache = False
    build_runner(cfg3)
    assert len(list(pathlib.Path(tmp_path / "cache").rglob("*.npz"))) == 6


def test_runner_resume(tmp_path):
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    runner.train()
    cfg2 = _runner_config(tmp_path, "GCN")
    cfg2.save_dir = cfg.save_dir
    cfg2.train.is_resume = True
    cfg2.train.max_epoch = 3
    runner2 = build_runner(cfg2)
    result = runner2.train()  # must start at epoch 2, not crash
    assert np.isfinite(result["best_val_mae"])


def test_sgd_momentum_and_lr_decay():
    tx, sched = build_optimizer(
        {"optimizer": "SGD", "lr": 0.1, "momentum": 0.9, "lr_decay": 0.1,
         "lr_decay_epoch": [2, 4]},
        steps_per_epoch=10,
    )
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01)
    assert float(sched(45)) == pytest.approx(0.001)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    g = {"w": jnp.ones(3)}
    up, st = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(up["w"]), -0.1 * np.ones(3), rtol=1e-6)


def test_lr_decay_duplicate_boundaries_compound():
    """Two decay epochs that land on the SAME step boundary must
    compound gamma twice (torch MultiStepLR semantics), not collapse
    into a single decay."""
    tx, sched = build_optimizer(
        {"optimizer": "SGD", "lr": 1.0, "lr_decay": 0.1,
         "lr_decay_epoch": [1, 1, 3]},
        steps_per_epoch=1,
    )
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(2)) == pytest.approx(0.01)   # 0.1 applied twice
    assert float(sched(4)) == pytest.approx(0.001)


def test_resume_preserves_best(tmp_path):
    """Resume must not let a worse post-resume epoch overwrite 'best'."""
    import pathlib
    import json

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "resbest")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    runner.train()
    best_before = runner.ckpt.meta("best")["val_mae"]
    # fake an excellent historical best; resume must respect it
    meta_path = pathlib.Path(cfg.save_dir) / "checkpoints" / "best.meta.json"
    meta = json.loads(meta_path.read_text())
    meta["val_mae"] = 1e-9
    meta_path.write_text(json.dumps(meta))
    payload = (
        pathlib.Path(cfg.save_dir) / "checkpoints" / "best.msgpack"
    ).read_bytes()

    cfg2 = _runner_config(tmp_path, "GCN")
    cfg2.save_dir = cfg.save_dir
    cfg2.train.is_resume = True
    cfg2.train.max_epoch = 3
    build_runner(cfg2).train()
    # snapshot unchanged: no post-resume epoch beat 1e-9
    assert (
        pathlib.Path(cfg.save_dir) / "checkpoints" / "best.msgpack"
    ).read_bytes() == payload
    assert best_before >= 0


def test_snapshot_epoch_tags(tmp_path):
    import pathlib

    cfg = _runner_config(tmp_path, "GCN")
    cfg.save_dir = str(tmp_path / "snaps")
    cfg.train.max_epoch = 4
    cfg.train.snapshot_epoch = 2
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    runner = build_runner(cfg)
    runner.train()
    tags = sorted(
        p.stem for p in (pathlib.Path(cfg.save_dir) / "checkpoints").glob("*.msgpack")
    )
    assert "best" in tags and "latest" in tags
    assert any(t.startswith("epoch_") for t in tags)


def test_device_shuffle_matches_perm_fed_path():
    """make_scan_train_epochs (device-resident jax.random shuffling)
    must be step-for-step identical to make_scan_train_epoch when fed
    the SAME permutations — the runner's train.device_shuffle knob only
    moves the shuffle on-device, it must not change the training
    computation."""
    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.train.scan_epoch import (
        device_dataset,
        make_scan_train_epoch,
        make_scan_train_epochs,
    )

    num, bs, epochs = 12, 4, 3
    graphs = synthetic_qm8_graphs(num, seed=0, n_lo=4, n_hi=8)
    ds = pack_dataset(graphs, n_max=10, num_eig_vec=4, standardize=True)
    data = device_dataset(ds)
    model = tiny_model("LanczosNet", num_eig_vec=4,
                       short_diffusion_dist=[1, 2],
                       long_diffusion_dist=[3, 5])
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    batch0 = jax.tree.map(lambda x: x[:bs], data)
    state_a = init_state(model, batch0, tx, seed=0)
    state_b = init_state(model, batch0, tx, seed=0)

    key = jax.random.PRNGKey(7)
    epochs_fn = make_scan_train_epochs(
        model, tx, num_graphs=num, batch_size=bs, epochs=epochs
    )
    state_a, losses_a, _ = epochs_fn(state_a, data, key)

    # replicate the device shuffle on the host with the same keys (the
    # program first splits key -> (next_key, sub), epoch keys from sub)
    steps = num // bs
    _, sub = jax.random.split(key)
    perms = [
        np.asarray(jax.random.permutation(k, num))[: steps * bs]
        for k in jax.random.split(sub, epochs)
    ]
    perm = jnp.asarray(
        np.concatenate(perms).reshape(epochs * steps, bs).astype(np.int32)
    )
    epoch_fn = make_scan_train_epoch(model, tx)
    state_b, losses_b = epoch_fn(state_b, data, perm)

    np.testing.assert_allclose(
        np.asarray(losses_a), np.asarray(losses_b), rtol=1e-6, atol=1e-7
    )
    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7
        )


def test_runner_device_shuffle_end_to_end(tmp_path):
    """The scanned runner trains with train.device_shuffle (default on)
    and with it off; both produce finite losses and checkpoints."""
    import pathlib

    for flag in (True, False):
        cfg = _runner_config(tmp_path / f"ds_{int(flag)}", "GCN")
        cfg.train.scan_epoch = True
        cfg.train.device_shuffle = flag
        cfg.train.max_epoch = 3
        cfg.train.valid_epoch = 2  # exercises group sizes 2 then 1
        pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
        runner = build_runner(cfg)
        res = runner.train()
        assert np.isfinite(res["best_val_mae"])


def test_fused_train_eval_matches_separate():
    """make_scan_train_epochs_eval must produce the exact state/losses
    of make_scan_train_epochs plus the exact val sums of make_scan_eval
    — it only fuses the two dispatches into one program."""
    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.train.scan_epoch import (
        device_dataset,
        make_scan_eval,
        make_scan_train_epochs,
        make_scan_train_epochs_eval,
    )

    num, bs, epochs = 12, 4, 2
    graphs = synthetic_qm8_graphs(num, seed=0, n_lo=4, n_hi=8)
    ds = pack_dataset(graphs, n_max=10, num_eig_vec=4, standardize=True)
    vgraphs = synthetic_qm8_graphs(6, seed=1, n_lo=4, n_hi=8)
    vds = pack_dataset(vgraphs, n_max=10, num_eig_vec=4,
                       standardize=True, stats=ds.stats)
    data, vdata = device_dataset(ds), device_dataset(vds)
    s_v = -(-len(vds) // bs)
    vidx = np.zeros((s_v, bs), np.int32)
    vvalid = np.zeros((s_v, bs), np.float32)
    vidx.reshape(-1)[: len(vds)] = np.arange(len(vds))
    vvalid.reshape(-1)[: len(vds)] = 1.0
    vidx, vvalid = jnp.asarray(vidx), jnp.asarray(vvalid)

    model = tiny_model("LanczosNet", num_eig_vec=4,
                       short_diffusion_dist=[1, 2],
                       long_diffusion_dist=[3, 5])
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    batch0 = jax.tree.map(lambda x: x[:bs], data)
    key = jax.random.PRNGKey(3)

    sa = init_state(model, batch0, tx, seed=0)
    fn = make_scan_train_epochs(model, tx, num_graphs=num,
                                batch_size=bs, epochs=epochs)
    sa, losses_a, _ = fn(sa, data, key)
    esum_a, count_a = make_scan_eval(model)(sa.params, vdata, vidx, vvalid)

    sb = init_state(model, batch0, tx, seed=0)
    fused = make_scan_train_epochs_eval(model, tx, num_graphs=num,
                                        batch_size=bs, epochs=epochs)
    sb, losses_b, esum_b, count_b, _ = fused(
        sb, data, key, vdata, vidx, vvalid
    )
    np.testing.assert_allclose(np.asarray(losses_a), np.asarray(losses_b),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(esum_a), np.asarray(esum_b),
                               rtol=1e-5, atol=1e-6)
    assert float(count_a) == float(count_b)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        jax.device_get(sa.params), jax.device_get(sb.params),
    )


def test_runner_fused_eval_end_to_end(tmp_path):
    """The runner with train.fused_eval on (default) and off reports the
    same per-epoch val MAE trajectory."""
    import yaml
    from lanczosnet_tpu.train.runner import build_runner
    from lanczosnet_tpu.utils.config import load_config

    def run(fused, name):
        cfg = {
            "exp_name": name, "runner": "QM8Runner", "seed": 5,
            "exp_dir": str(tmp_path),
            "dataset": {"source": "synthetic", "n_max": 12, "num_atom": 8,
                        "num_train": 64, "num_val": 16, "num_test": 16,
                        "standardize": True},
            "model": {"name": "LanczosNet", "hidden_dim": [16, 16],
                      "embed_dim": 16, "num_eig_vec": 4,
                      "short_diffusion_dist": [1, 2],
                      "long_diffusion_dist": [3, 5], "dropout": 0.1},
            "train": {"optimizer": "Adam", "lr": 1.0e-3, "batch_size": 16,
                      "max_epoch": 4, "valid_epoch": 2,
                      "scan_epoch": True, "fused_eval": fused},
            "test": {"test_model": None},
        }
        p = tmp_path / f"{name}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        r = build_runner(load_config(p))
        out = r.train()
        import json
        maes = []
        for line in (Path(r.run_dir) / "metrics.jsonl").read_text().splitlines():
            rec = json.loads(line)
            if rec.get("event") == "val":
                maes.append(rec["mae"])
        return out, maes

    out_f, maes_f = run(True, "fused_on")
    out_s, maes_s = run(False, "fused_off")
    assert len(maes_f) == len(maes_s) > 0
    np.testing.assert_allclose(maes_f, maes_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_f["best_val_mae"], out_s["best_val_mae"],
                               rtol=1e-5)
