"""HTTP serving front: multi-model residency + JSON API
(ROADMAP.md #6 "multi-model residency and an HTTP front")."""

import json
import pathlib
import threading
import urllib.request

import numpy as np
import pytest

from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.serve import Predictor
from lanczosnet_tpu.serve_http import (
    ModelServer,
    make_http_server,
    serve_forever_in_thread,
)
from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import save_config
from tests.test_train import _runner_config


def _train(tmp_path, name, model="GCN", **kw):
    cfg = _runner_config(tmp_path / name, model, **kw)
    pathlib.Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, pathlib.Path(cfg.save_dir) / "config.yaml")
    build_runner(cfg).train()
    return cfg.save_dir


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def http_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_http")
    run_a = _train(tmp, "a", "GCN")
    run_b = _train(tmp, "b", "GraphSAGE")
    srv = ModelServer.from_run_dirs(
        {"gcn": run_a, "sage": run_b}, batch_size=8, max_delay_ms=5.0
    )
    httpd = make_http_server(srv)
    serve_forever_in_thread(httpd)
    host, port = httpd.server_address
    yield srv, f"http://{host}:{port}"
    httpd.shutdown()
    srv.close()


def _wire_graphs(n, seed=0):
    graphs = synthetic_qm8_graphs(n, seed=seed, n_hi=10)
    wire = [
        {
            "atom_type": g["atom_type"].tolist(),
            "adj": g["adj"].tolist(),
        }
        for g in graphs
    ]
    return graphs, wire


def test_health_and_model_list(http_env):
    _, base = http_env
    code, body = _get(f"{base}/healthz")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(f"{base}/v1/models")
    names = [m["name"] for m in body["models"]]
    assert names == ["gcn", "sage"]
    assert all(m["num_task"] == 16 for m in body["models"])


def test_predict_matches_direct_predictor(http_env):
    srv, base = http_env
    graphs, wire = _wire_graphs(5, seed=3)
    code, body = _post(f"{base}/v1/models/gcn:predict", {"graphs": wire})
    assert code == 200
    preds = np.asarray(body["predictions"])
    assert preds.shape == (5, 16)
    direct = srv._predictors["gcn"].predict(
        [{k: v for k, v in g.items() if k != "label"} for g in graphs]
    )
    np.testing.assert_allclose(preds, direct, rtol=1e-4, atol=1e-5)


def test_models_are_independent(http_env):
    _, base = http_env
    _, wire = _wire_graphs(3, seed=5)
    _, a = _post(f"{base}/v1/models/gcn:predict", {"graphs": wire})
    _, b = _post(f"{base}/v1/models/sage:predict", {"graphs": wire})
    assert not np.allclose(a["predictions"], b["predictions"])


def test_concurrent_clients_coalesce_and_stats(http_env):
    _, base = http_env
    _, wire = _wire_graphs(1, seed=7)
    results = []

    def client():
        code, body = _post(
            f"{base}/v1/models/gcn:predict", {"graphs": wire}
        )
        results.append((code, body))

    threads = [threading.Thread(target=client) for _ in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(c == 200 for c, _ in results)
    ref = results[0][1]["predictions"]
    for _, body in results:
        np.testing.assert_allclose(body["predictions"], ref, rtol=1e-5)
    code, stats = _get(f"{base}/v1/models/gcn/stats")
    assert code == 200 and stats["count"] >= 12
    assert stats["p50_ms"] > 0 and stats["p95_ms"] >= stats["p50_ms"]


def test_error_paths(http_env):
    _, base = http_env
    code, body = _post(f"{base}/v1/models/nope:predict", {"graphs": []})
    assert code == 404
    code, body = _post(f"{base}/v1/models/gcn:predict", {"graphs": []})
    assert code == 400
    code, body = _get(f"{base}/v1/models")
    assert code == 200
