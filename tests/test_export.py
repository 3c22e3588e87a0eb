"""`lanczosnet_tpu.export` — serialized StableHLO inference artifacts.

The deployment surface the reference lacks entirely (`[R] run_exp.py
-t` requires repo + torch + exact code revision): a trained run
exports to a self-contained directory (jax.export program + msgpack
params + packing contract) that `load_predictor` serves without model
code. The contract under test: artifact predictions match the live
Predictor's on the same backend to float-reassociation tolerance
(the deserialized program is recompiled), the full serving stack
(MicroBatcher, ModelServer) takes an ArtifactPredictor unchanged, and
the failure modes (wrong backend, future format) are loud.
"""

import json
import pathlib

import numpy as np
import pytest

from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.export import (
    ArtifactPredictor,
    export_predictor,
    is_artifact_dir,
    load_predictor,
)
from lanczosnet_tpu.serve import MicroBatcher, Predictor
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import save_config
from tests.test_train import _runner_config


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """One short LanczosNet training run shared by the module — the
    flagship model exercises the on-device Ritz precompute inside the
    exported program."""
    tmp = tmp_path_factory.mktemp("export_run")
    cfg = _runner_config(tmp, "LanczosNet")
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()
    return cfg.save_dir


def test_export_roundtrip_bitwise(trained_run, tmp_path):
    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    out = export_predictor(pred, tmp_path / "artifact")
    assert is_artifact_dir(out)
    assert not is_artifact_dir(trained_run)

    loaded = load_predictor(out)
    assert isinstance(loaded, ArtifactPredictor)
    assert loaded.model is None  # no model code reconstructed
    assert loaded.n_max == pred.n_max
    assert loaded.num_task == pred.num_task
    # label stats survive the json round trip
    np.testing.assert_allclose(loaded.stats.mean, pred.stats.mean)
    np.testing.assert_allclose(loaded.stats.std, pred.stats.std)

    graphs = synthetic_qm8_graphs(11, seed=42, n_hi=10)
    unlabeled = [{k: v for k, v in g.items() if k != "label"} for g in graphs]
    y_live = pred.predict(unlabeled)
    y_art = loaded.predict(unlabeled)
    # same backend, same StableHLO — but the deserialized program is
    # RE-compiled, and XLA may fuse/reassociate differently than the
    # live jit (measured: max |diff| ~3e-8 on CPU), so the contract is
    # tight allclose, not bit-equality
    np.testing.assert_allclose(y_live, y_art, rtol=1e-6, atol=1e-7)


def test_artifact_behind_microbatcher(trained_run, tmp_path):
    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    out = export_predictor(pred, tmp_path / "artifact")
    loaded = load_predictor(out)
    mb = MicroBatcher(loaded, max_delay_ms=5)
    try:
        graphs = synthetic_qm8_graphs(6, seed=3, n_hi=10)
        futs = [mb.submit(g) for g in graphs]
        ys = np.stack([f.result(timeout=60) for f in futs])
        assert ys.shape == (6, 16)
        assert np.isfinite(ys).all()
        np.testing.assert_allclose(ys, pred.predict(graphs), rtol=1e-5,
                                   atol=1e-6)
    finally:
        mb.close()


def test_model_server_loads_artifact_dirs(trained_run, tmp_path):
    """ModelServer.from_run_dirs auto-detects artifact directories and
    serves live run dirs and artifacts side by side."""
    from lanczosnet_tpu.serve_http import ModelServer

    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    art = export_predictor(pred, tmp_path / "artifact")
    srv = ModelServer.from_run_dirs(
        {"live": trained_run, "frozen": str(art)},
        batch_size=8, warmup=False,
    )
    try:
        graphs = synthetic_qm8_graphs(4, seed=7, n_hi=10)
        y_live = srv.predict("live", graphs)
        y_frozen = srv.predict("frozen", graphs)
        np.testing.assert_allclose(y_live, y_frozen, rtol=1e-5, atol=1e-6)
        names = {m["name"] for m in srv.models()}
        assert names == {"live", "frozen"}
    finally:
        srv.close()


def test_wrong_backend_artifact_is_loud(trained_run, tmp_path, monkeypatch):
    """An artifact exported only for another platform must refuse to
    load with an actionable error, not fail at first request."""
    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    out = export_predictor(pred, tmp_path / "artifact")
    meta_p = out / "meta.json"
    meta = json.loads(meta_p.read_text())
    import jax

    assert jax.default_backend() in meta["platforms"]
    # the serialized program can't be doctored, so simulate loading the
    # cpu-exported artifact on a different backend: the guard compares
    # jax.default_backend() against exported.platforms and must raise
    # with re-export guidance (export.py:load_predictor)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu9k")
    with pytest.raises(ValueError, match="re-export"):
        load_predictor(out)


def test_future_format_version_rejected(trained_run, tmp_path):
    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    out = export_predictor(pred, tmp_path / "artifact")
    meta_p = out / "meta.json"
    meta = json.loads(meta_p.read_text())
    meta["format_version"] = 99
    meta_p.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer"):
        load_predictor(out)


def test_export_cli(trained_run, tmp_path, capsys):
    from lanczosnet_tpu.export import main

    out = tmp_path / "cli_artifact"
    main([str(trained_run), "-o", str(out), "--batch-size", "8"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["artifact"] == str(out)
    assert payload["batch_size"] == 8
    assert is_artifact_dir(out)


def test_artifact_carries_compact_wire(trained_run, tmp_path):
    """r5 artifacts serialize BOTH request programs; the reloaded
    predictor keeps the compact uint8 wire and matches the legacy one."""
    import numpy as np

    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs

    pred = Predictor.from_run_dir(trained_run, batch_size=8)
    out = export_predictor(pred, tmp_path / "artifact")
    assert (out / "request_program_compact.jaxexport").exists()

    art = load_predictor(out)
    assert art.compact_wire
    graphs = synthetic_qm8_graphs(5, seed=13, n_hi=10)
    y_compact = art.predict(graphs)
    art.compact_wire = False  # force the legacy program
    y_legacy = art.predict(graphs)
    np.testing.assert_allclose(y_compact, y_legacy, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        y_compact, pred.predict(graphs), rtol=1e-4, atol=1e-5
    )
