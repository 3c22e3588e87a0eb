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
    transcode,
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


# ---- C++ wire transcoders (no server needed) --------------------------------


def _json_wire(graphs, **extra):
    return json.dumps(
        {
            "graphs": [
                {
                    "atom_type": np.asarray(g["atom_type"]).tolist(),
                    "adj": np.asarray(g["adj"]).tolist(),
                    **(
                        {"node_feat": np.asarray(g["node_feat"]).tolist()}
                        if "node_feat" in g
                        else {}
                    ),
                    **extra,
                }
                for g in graphs
            ]
        }
    ).encode()


def test_transcode_json_matches_python_encoder():
    """The C++ JSON->LNG1 rewrite is byte-identical to
    encode_graphs_binary on the same graphs — 3-D float-but-integral
    adjacency (what json.dumps of float32 .tolist() actually sends),
    with and without node_feat."""
    graphs = _graphs(3, seed=21)
    rng = np.random.default_rng(4)
    graphs[1]["node_feat"] = rng.normal(
        size=(len(graphs[1]["atom_type"]), 5)
    ).astype(np.float32)
    got = transcode("json->lng1", _json_wire(graphs))
    assert got == encode_graphs_binary(graphs)


def test_transcode_json_2d_adj():
    g = _graphs(1, seed=2)[0]
    g2 = {"atom_type": g["atom_type"], "adj": np.asarray(g["adj"])[0]}
    got = transcode("json->lng1", _json_wire([g2]))
    assert got == encode_graphs_binary([g2])
    back = decode_graphs_binary(got)
    assert back[0]["adj"].shape == (1,) + g2["adj"].shape


def test_transcode_falls_back_where_binary_wire_cannot_carry():
    """Everything the LNG1 wire can't represent returns None — the
    server then routes the ORIGINAL body to the Python JSON path."""
    g = _graphs(1, seed=6)[0]
    frac = dict(g, adj=np.asarray(g["adj"]) * 0.5)  # non-integral
    assert transcode("json->lng1", _json_wire([frac])) is None
    neg = dict(g, adj=-np.asarray(g["adj"]))  # out of [0, 255]
    assert transcode("json->lng1", _json_wire([neg])) is None
    assert transcode("json->lng1", _json_wire([g], weight=1.0)) is None
    assert transcode("json->lng1", b"not json at all") is None
    assert transcode("json->lng1", b'{"graphs": []}') is None
    ragged = json.dumps(
        {"graphs": [{"atom_type": [1, 2], "adj": [[0, 1], [1]]}]}
    ).encode()
    assert transcode("json->lng1", ragged) is None
    # null node_feat is the JSON wire's "absent" — must transcode
    ok = transcode(
        "json->lng1",
        json.dumps(
            {
                "graphs": [
                    {
                        "atom_type": np.asarray(g["atom_type"]).tolist(),
                        "adj": np.asarray(g["adj"]).tolist(),
                        "node_feat": None,
                    }
                ]
            }
        ).encode(),
    )
    assert ok == encode_graphs_binary([g])


def test_transcode_response_round_trips_float32():
    preds = np.random.default_rng(8).normal(size=(3, 16)).astype(np.float32)
    body = (
        b"LNP1"
        + struct.pack("<II", 3, 16)
        + np.ascontiguousarray(preds).tobytes()
    )
    js = transcode("lnp1->json", body)
    back = np.asarray(json.loads(js)["predictions"], np.float32)
    np.testing.assert_array_equal(back, preds)  # %.9g is f32-exact
    assert transcode("lnp1->json", body + b"\0") is None
    assert transcode("lnp1->json", b'{"error": "boom"}') is None


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
    """JSON requests ride the C++ transcode (front.transcoded() moves,
    so no per-request json.loads in the worker) and still answer the
    JSON wire exactly."""
    srv, front, base = native_env
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
    before = front.transcoded()
    code, body = _post(f"{base}/v1/models/gcn:predict", payload)
    assert code == 200
    assert front.transcoded() == before + 1
    preds = np.asarray(json.loads(body)["predictions"], np.float32)
    direct = srv._predictors["gcn"].predict(graphs)
    np.testing.assert_allclose(preds, direct, rtol=1e-5, atol=1e-6)


def test_json_wire_python_fallback_matches_direct(native_env):
    """Float edge weights can't ride the binary wire: the front must
    leave the body alone (transcoded() unchanged) and the Python JSON
    path must serve it, matching the in-process predictor on the SAME
    float graphs. (No adj-vs-adj/2 distinguishability check: GCN's
    degree normalization cancels uniform edge scaling exactly.)"""
    srv, front, base = native_env
    g = _graphs(1, seed=13)[0]
    half = dict(g, adj=np.asarray(g["adj"], np.float32) * 0.5)
    payload = json.dumps(
        {
            "graphs": [
                {"atom_type": half["atom_type"].tolist(),
                 "adj": half["adj"].tolist()}
            ]
        }
    ).encode()
    before = front.transcoded()
    code, body = _post(f"{base}/v1/models/gcn:predict", payload)
    assert code == 200
    assert front.transcoded() == before
    preds = np.asarray(json.loads(body)["predictions"], np.float32)
    direct = srv._predictors["gcn"].predict([half])
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
