"""Native (C++ epoll) HTTP front for the serving path.

The r5 saturation sweep (PARITY.md "Serving") located the remaining
serving ceiling in the HOST front, not the chip: the stdlib
ThreadingHTTPServer delivers 420 req/s while the identical
MicroBatcher + Predictor path reaches 1248 req/s when requests are
submitted in-process — per-request Python (HTTP parse, one OS thread
per connection, json-decoding nested adjacency lists) owns the 3× gap.

This module pairs `native/servefront.cc` (one epoll loop thread:
accept / parse / keep-alive / backpressure, GET /healthz and
/v1/models answered without touching Python) with the existing
:class:`~lanczosnet_tpu.serve_http.ModelServer`:

- the pull loop crosses the GIL ONCE per coalesced batch
  (`lnfront_next_batch` hands back every queued request body in one
  ctypes call into a preallocated buffer);
- request bodies are either the serve_http JSON wire (compatible) or
  the binary graph codec below (`encode_graphs_binary`), which decodes
  with a handful of `np.frombuffer` views instead of json;
- JSON bodies the binary wire can carry (integral adjacency in
  [0, 255], no unknown keys) are TRANSCODED TO LNG1 IN C++ before
  Python sees them, and the LNP1 answer is transcoded back — the r5b
  sweep measured server-side `json.loads` of nested adjacency lists as
  the one per-request Python step left, ~2× the binary wire's latency
  at low-mid concurrency. Non-conforming JSON (float edge weights,
  extra keys, malformed bodies) falls back to the Python JSON path
  unchanged, which also keeps all 400 error text single-sourced.
  `NativeFront.transcoded()` counts the rewrites;
- responses are enqueued from the MicroBatcher's completion thread via
  `Future.add_done_callback` → `lnfront_respond` (thread-safe; an
  eventfd wakes the epoll loop), so no per-request Python thread ever
  exists.

Binary wire (little-endian), version 1:

    request  = b"LNG1" u32:n_graphs graph*
    graph    = u16:n u8:e u8:0 u16:f u16:0
               i32[n]:atom_type  u8[e*n*n]:adj  f32[n*f]:node_feat
    response = b"LNP1" u32:n_graphs u32:num_task f32[n_graphs*num_task]

uint8 adjacency is exactly the Predictor's compact device wire
(serve.py): QM8 bond multiplicities are small ints, and the operator
normalization runs inside the compiled request program. Graphs with
float edge weights must use the JSON wire.

The reference (lrjconan/LanczosNetwork) has no serving at all — its
only inference is `run_exp.py -t` (SURVEY.md §2.1); this is part of the
production surface SURVEY.md §5 calls for, native where it is hot.

Falls back loudly: :func:`available` gates tests/CLI, and the
stdlib front (`serve_http`) remains the portable default.
"""

from __future__ import annotations

import ctypes
import json
import struct
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from lanczosnet_tpu.serve_http import ModelServer, _decode_graph

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libservefront.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_MAGIC_REQ = b"LNG1"
_MAGIC_RESP = b"LNP1"


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.lnfront_start.restype = ctypes.c_int
        lib.lnfront_start.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.lnfront_register_model.restype = ctypes.c_int
        lib.lnfront_register_model.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.lnfront_set_models_json.restype = None
        lib.lnfront_set_models_json.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.lnfront_next_batch.restype = ctypes.c_int
        lib.lnfront_next_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            ctypes.c_int32,
        ]
        lib.lnfront_respond.restype = None
        lib.lnfront_respond.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int,
        ]
        lib.lnfront_served.restype = ctypes.c_uint64
        lib.lnfront_served.argtypes = [ctypes.c_int]
        lib.lnfront_transcoded.restype = ctypes.c_uint64
        lib.lnfront_transcoded.argtypes = [ctypes.c_int]
        lib.lnfront_transcode.restype = ctypes.c_int32
        lib.lnfront_transcode.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags="C"), ctypes.c_int32,
        ]
        lib.lnfront_port.restype = ctypes.c_int
        lib.lnfront_port.argtypes = [ctypes.c_int]
        lib.lnfront_stop.restype = None
        lib.lnfront_stop.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---- binary graph codec ----------------------------------------------------


def encode_graphs_binary(graphs: Sequence[dict]) -> bytes:
    """Client-side encoder for the binary request wire (see module
    docstring). `adj` must be integral in [0, 255]."""
    parts = [_MAGIC_REQ, struct.pack("<I", len(graphs))]
    for g in graphs:
        atom = np.ascontiguousarray(g["atom_type"], np.int32)
        adj = np.ascontiguousarray(g["adj"], np.uint8)
        if adj.ndim == 2:
            adj = adj[None]
        feat = g.get("node_feat")
        n = atom.shape[0]
        e = adj.shape[0]
        f = 0 if feat is None else int(np.asarray(feat).shape[-1])
        if adj.shape != (e, n, n):
            raise ValueError(f"adj shape {adj.shape} != ({e},{n},{n})")
        parts.append(struct.pack("<HBBHH", n, e, 0, f, 0))
        parts.append(atom.tobytes())
        parts.append(adj.tobytes())
        if f:
            parts.append(
                np.ascontiguousarray(feat, np.float32).tobytes()
            )
    return b"".join(parts)


def decode_graphs_binary(body) -> list[dict]:
    """Server-side decoder: `np.frombuffer` views over the request
    body — no json, no per-element Python. The caller must pass a
    buffer that stays immutable for the life of the decoded graphs
    (`bytes`, not a slice of a reused pull buffer); the arrays are
    views into it until the Predictor packs them."""
    if bytes(body[:4]) != _MAGIC_REQ:
        raise ValueError("bad magic")
    (count,) = struct.unpack_from("<I", body, 4)
    if count > 4096:
        raise ValueError(f"too many graphs: {count}")
    off = 8
    graphs = []
    for _ in range(count):
        n, e, _pad, f, _pad2 = struct.unpack_from("<HBBHH", body, off)
        off += 8
        atom = np.frombuffer(body, np.int32, n, off)
        off += 4 * n
        adj = np.frombuffer(body, np.uint8, e * n * n, off).reshape(e, n, n)
        off += e * n * n
        g = {"atom_type": atom, "adj": adj}
        if f:
            g["node_feat"] = np.frombuffer(
                body, np.float32, n * f, off
            ).reshape(n, f)
            off += 4 * n * f
        graphs.append(g)
    if off != len(body):
        raise ValueError(f"trailing bytes: {len(body) - off}")
    return graphs


def transcode(direction: str, body: bytes) -> Optional[bytes]:
    """Run the C++ wire transcoder directly (test/debug handle).

    ``direction`` is ``"json->lng1"`` (what the front does to
    schema-conforming request bodies) or ``"lnp1->json"`` (what it does
    to their responses). Returns ``None`` where the server would fall
    back to the Python JSON path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libservefront.so unavailable")
    d = {"json->lng1": 0, "lnp1->json": 1}[direction]
    # lnp1->json expands ~4.5x (4-byte f32 -> up to 17 chars + ", ")
    out = np.empty(max(8 * len(body) + 4096, 1 << 16), np.uint8)
    n = lib.lnfront_transcode(d, body, len(body), out, out.size)
    if n == -2:  # pragma: no cover — cap sized generously above
        raise ValueError("transcode buffer too small")
    return None if n < 0 else out[:n].tobytes()


def decode_predictions_binary(body: bytes) -> np.ndarray:
    if body[:4] != _MAGIC_RESP:
        raise ValueError("bad magic")
    count, tasks = struct.unpack_from("<II", body, 4)
    return np.frombuffer(body, np.float32, count * tasks, 12).reshape(
        count, tasks
    )


# ---- server ----------------------------------------------------------------


class _Pending:
    """Fan-in for one HTTP request's N graph futures. The LAST future's
    callback (MicroBatcher completer thread) encodes and responds —
    no polling thread, no per-request thread."""

    __slots__ = ("front", "rid", "results", "remaining", "error",
                 "binary", "lock")

    def __init__(self, front: "NativeFront", rid: int, n: int, binary: bool):
        self.front = front
        self.rid = rid
        self.results: list = [None] * n
        self.remaining = n
        self.error: Optional[BaseException] = None
        self.binary = binary
        self.lock = threading.Lock()

    def make_cb(self, i: int):
        def cb(fut):
            try:
                self.results[i] = fut.result()
            except BaseException as exc:  # noqa: BLE001 — surfaced as a 500
                self.error = exc
            with self.lock:
                self.remaining -= 1
                last = self.remaining == 0
            if last:
                self._respond()

        return cb

    def _respond(self) -> None:
        if self.error is not None:
            self.front._respond_json(
                self.rid, 500, {"error": str(self.error)}
            )
            return
        preds = np.stack(self.results).astype(np.float32, copy=False)
        if self.binary:
            body = (
                _MAGIC_RESP
                + struct.pack("<II", preds.shape[0], preds.shape[1])
                + np.ascontiguousarray(preds).tobytes()
            )
            self.front._respond_raw(self.rid, 200, body, binary=True)
        else:
            self.front._respond_json(
                self.rid, 200, {"predictions": preds.tolist()}
            )


class NativeFront:
    """C++ epoll HTTP front bound to a :class:`ModelServer`.

    One Python pull thread drains the C++ request queue in coalesced
    batches and feeds each model's MicroBatcher; responses flow back
    through future callbacks. ``port=0`` binds an ephemeral port (read
    it back from ``.port``).
    """

    def __init__(
        self,
        server: ModelServer,
        host: str = "127.0.0.1",
        port: int = 0,
        backlog: int = 512,
        max_pull: int = 512,
        buf_mb: int = 64,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libservefront.so unavailable (build failed?) — use the "
                "stdlib front (lanczosnet_tpu.serve_http)"
            )
        self._lib = lib
        self.server = server
        out_port = ctypes.c_int(0)
        self.sid = lib.lnfront_start(
            host.encode(), port, backlog, ctypes.byref(out_port)
        )
        if self.sid < 0:
            raise OSError(f"lnfront_start failed for {host}:{port}")
        self.host = host
        self.port = out_port.value
        self._names: list[str] = []
        for m in server.models():
            lib.lnfront_register_model(self.sid, m["name"].encode())
            self._names.append(m["name"])
        lib.lnfront_set_models_json(
            self.sid, json.dumps({"models": server.models()}).encode()
        )
        self._max_pull = max_pull
        self._ids = np.empty(max_pull, np.uint64)
        self._offs = np.empty(max_pull, np.int32)
        self._lens = np.empty(max_pull, np.int32)
        self._midx = np.empty(max_pull, np.int32)
        self._buf = np.empty(buf_mb << 20, np.uint8)
        self._stopped = threading.Event()
        self._pull = threading.Thread(target=self._pull_loop, daemon=True)
        self._pull.start()

    # responses may be enqueued from any thread (the C++ side locks)
    def _respond_raw(
        self, rid: int, status: int, body: bytes, binary: bool
    ) -> None:
        self._lib.lnfront_respond(
            self.sid, rid, status, body, len(body), 0 if binary else 1
        )

    def _respond_json(self, rid: int, status: int, payload: dict) -> None:
        self._respond_raw(
            rid, status, json.dumps(payload).encode(), binary=False
        )

    def served(self) -> int:
        return int(self._lib.lnfront_served(self.sid))

    def transcoded(self) -> int:
        """JSON request bodies rewritten to the binary wire in C++
        (the Python-free request path; see module docstring)."""
        return int(self._lib.lnfront_transcoded(self.sid))

    def _handle(self, rid: int, model_idx: int, body: bytes) -> None:
        name = self._names[model_idx]
        try:
            if body[:4] == _MAGIC_REQ:
                graphs, binary = decode_graphs_binary(body), True
            else:
                req = json.loads(bytes(body) or b"{}")
                graphs = [_decode_graph(g) for g in req.get("graphs", [])]
                binary = False
            if not graphs:
                raise ValueError("empty graphs")
        except (ValueError, TypeError, KeyError, struct.error) as exc:
            self._respond_json(rid, 400, {"error": f"bad request: {exc}"})
            return
        mb = self.server._batchers[name]
        pending = _Pending(self, rid, len(graphs), binary)
        # submit all before arming callbacks is NOT needed: remaining
        # starts at n, so early completions can't fire the respond
        # until every callback has run at least once
        for i, g in enumerate(graphs):
            mb.submit(g).add_done_callback(pending.make_cb(i))

    def _pull_loop(self) -> None:
        lib = self._lib
        while not self._stopped.is_set():
            n = lib.lnfront_next_batch(
                self.sid, self._max_pull, 100.0, 0.2,
                self._ids, self._offs, self._lens, self._midx,
                self._buf, self._buf.size,
            )
            if n < 0:
                return  # stopped
            if n == 0:
                continue
            mv = memoryview(self._buf)
            for i in range(n):
                off, ln = int(self._offs[i]), int(self._lens[i])
                # copy the body out of the shared pull buffer: decoded
                # graphs are frombuffer VIEWS that sit in the
                # MicroBatcher queue while the next lnfront_next_batch
                # overwrites _buf (caught by
                # test_concurrent_clients_coalesce as garbage inputs)
                self._handle(
                    int(self._ids[i]), int(self._midx[i]),
                    bytes(mv[off:off + ln]),
                )

    def close(self) -> None:
        if self._stopped.is_set():
            return
        self._stopped.set()
        self._lib.lnfront_stop(self.sid)  # unblocks next_batch with -1
        self._pull.join(timeout=5.0)


def main(argv=None) -> None:
    """CLI: ``python -m lanczosnet_tpu.serve_native --model
    gcn=exp/... --port 8000`` (also: ``lanczosnet-serve --native``)."""
    import argparse

    ap = argparse.ArgumentParser(
        description="LanczosNet-TPU model server (native C++ front)"
    )
    ap.add_argument(
        "--model", action="append", required=True, metavar="NAME=RUN_DIR",
        help="model name and trained run directory (repeatable)",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    args = ap.parse_args(argv)

    runs = dict(spec.split("=", 1) for spec in args.model)
    srv = ModelServer.from_run_dirs(
        runs, batch_size=args.batch_size, max_delay_ms=args.max_delay_ms
    )
    front = NativeFront(srv, host=args.host, port=args.port)
    print(
        f"serving {sorted(runs)} on http://{front.host}:{front.port} "
        "(native front)",
        flush=True,
    )
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        front.close()
        srv.close()


if __name__ == "__main__":
    main()
