"""Native C++ epoll serving front (native/servefront.cc +
serve_native.py): HTTP correctness against the same ModelServer the
stdlib front uses, plus the binary graph codec.

The predictor here is deliberately untrained (random init) — these
tests exercise the transport + batching + codec, and equality is
always measured against the SAME predictor called in-process."""

import json
import socket
import struct
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from lanczosnet_tpu.data.dataset import pack_dataset
from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.models import build_model
from lanczosnet_tpu.serve import Predictor
from lanczosnet_tpu.serve_http import ModelServer
from lanczosnet_tpu import serve_native
from lanczosnet_tpu.serve_native import (
    NativeFront,
    decode_graphs_binary,
    decode_predictions_binary,
    encode_graphs_binary,
)

pytestmark = pytest.mark.skipif(
    not serve_native.available(), reason="libservefront.so unavailable"
)

N_MAX = 12


def _tiny_predictor(batch_size=8):
    mcfg = {
        "name": "GCN",
        "num_atom": 8,
        "num_task": 16,
        "hidden_dim": [32],
        "embed_dim": 32,
    }
    model = build_model(mcfg)
    probe = pack_dataset(
        synthetic_qm8_graphs(2, seed=0, n_hi=8), n_max=N_MAX, num_eig_vec=0
    )
    batch = jax.tree.map(np.asarray, probe.slice_batch(np.arange(2)))
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)[
        "params"
    ]
    return Predictor(
        model, params, n_max=N_MAX, batch_size=batch_size, num_task=16
    )


@pytest.fixture(scope="module")
def native_env():
    srv = ModelServer(max_delay_ms=2.0)
    srv.add_model("gcn", _tiny_predictor(), warmup=True)
    front = NativeFront(srv, port=0)
    yield srv, front, f"http://127.0.0.1:{front.port}"
    front.close()
    srv.close()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, data, timeout=60):
    req = urllib.request.Request(
        url, data=data, method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _graphs(n, seed=0):
    graphs = synthetic_qm8_graphs(n, seed=seed, n_hi=10)
    return [{k: v for k, v in g.items() if k != "label"} for g in graphs]


# ---- codec (no server needed) ----------------------------------------------


def test_codec_roundtrip():
    graphs = _graphs(3, seed=7)
    body = encode_graphs_binary(graphs)
    back = decode_graphs_binary(memoryview(body))
    assert len(back) == 3
    for g, b in zip(graphs, back):
        np.testing.assert_array_equal(
            np.asarray(g["atom_type"], np.int32), b["atom_type"]
        )
        np.testing.assert_array_equal(
            np.asarray(g["adj"], np.uint8), b["adj"]
        )


def test_codec_rejects_garbage():
    with pytest.raises(ValueError):
        decode_graphs_binary(memoryview(b"XXXX" + b"\0" * 16))
    body = encode_graphs_binary(_graphs(1))
    with pytest.raises(ValueError):  # trailing bytes
        decode_graphs_binary(memoryview(body + b"\0"))


# ---- C++-only paths (no Python touched per request) -------------------------


def test_healthz_and_models(native_env):
    srv, _front, base = native_env
    code, body = _get(f"{base}/healthz")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(f"{base}/v1/models")
    assert code == 200
    assert [m["name"] for m in body["models"]] == ["gcn"]
    code, _ = _get(f"{base}/nope")
    assert code == 404


def test_unknown_model_404(native_env):
    _, _, base = native_env
    code, body = _post(
        f"{base}/v1/models/missing:predict", encode_graphs_binary(_graphs(1))
    )
    assert code == 404


# ---- predict paths -----------------------------------------------------------


def test_json_wire_matches_direct(native_env):
    srv, _front, base = native_env
    graphs = _graphs(4, seed=3)
    payload = json.dumps(
        {
            "graphs": [
                {"atom_type": g["atom_type"].tolist(),
                 "adj": g["adj"].tolist()}
                for g in graphs
            ]
        }
    ).encode()
    code, body = _post(f"{base}/v1/models/gcn:predict", payload)
    assert code == 200
    preds = np.asarray(json.loads(body)["predictions"], np.float32)
    direct = srv._predictors["gcn"].predict(graphs)
    np.testing.assert_allclose(preds, direct, rtol=1e-5, atol=1e-6)


def test_binary_wire_matches_direct(native_env):
    srv, _front, base = native_env
    graphs = _graphs(5, seed=11)
    code, body = _post(
        f"{base}/v1/models/gcn:predict", encode_graphs_binary(graphs)
    )
    assert code == 200
    preds = decode_predictions_binary(body)
    assert preds.shape == (5, 16)
    direct = srv._predictors["gcn"].predict(graphs)
    np.testing.assert_allclose(preds, direct, rtol=1e-5, atol=1e-6)


def test_bad_body_400(native_env):
    _, _, base = native_env
    code, body = _post(f"{base}/v1/models/gcn:predict", b"not json at all")
    assert code == 400
    code, body = _post(
        f"{base}/v1/models/gcn:predict", json.dumps({"graphs": []}).encode()
    )
    assert code == 400


def test_keepalive_pipelined_connection(native_env):
    """Several requests over ONE persistent connection."""
    _, front, _ = native_env
    graphs = _graphs(1, seed=5)
    body = encode_graphs_binary(graphs)
    s = socket.create_connection(("127.0.0.1", front.port), timeout=30)
    try:
        for _ in range(3):
            req = (
                b"POST /v1/models/gcn:predict HTTP/1.1\r\n"
                b"Host: x\r\nContent-Length: %d\r\n\r\n" % len(body)
            ) + body
            s.sendall(req)
            # read one full response
            buf = b""
            while b"\r\n\r\n" not in buf:
                buf += s.recv(65536)
            head, rest = buf.split(b"\r\n\r\n", 1)
            assert b"200 OK" in head.split(b"\r\n")[0]
            clen = int(
                [h for h in head.split(b"\r\n") if b"content-length" in h.lower()][0]
                .split(b":")[1]
            )
            while len(rest) < clen:
                rest += s.recv(65536)
            preds = decode_predictions_binary(rest[:clen])
            assert preds.shape == (1, 16)
    finally:
        s.close()


def test_concurrent_clients_coalesce(native_env):
    srv, front, base = native_env
    graphs = _graphs(8, seed=9)
    results = [None] * 8
    errors = []

    def worker(i):
        try:
            code, body = _post(
                f"{base}/v1/models/gcn:predict",
                encode_graphs_binary([graphs[i]]),
            )
            assert code == 200, body
            results[i] = decode_predictions_binary(body)[0]
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    direct = srv._predictors["gcn"].predict(graphs)
    np.testing.assert_allclose(
        np.stack(results), direct, rtol=1e-5, atol=1e-6
    )
    assert front.served() >= 8


def test_close_is_idempotent():
    srv = ModelServer(max_delay_ms=1.0)
    srv.add_model("gcn", _tiny_predictor(), warmup=False)
    front = NativeFront(srv, port=0)
    front.close()
    front.close()
    srv.close()
