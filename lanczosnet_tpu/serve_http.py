"""Multi-model residency + HTTP front for the serving path.

Completes ROADMAP.md #6: `serve.py` gives one device-resident
`Predictor` behind a deadline `MicroBatcher`; this module adds

- :class:`ModelServer` — several models resident on the chip at once
  (params for each stay device-resident; XLA executables are distinct
  per model so there is no cross-model recompile), each behind its own
  MicroBatcher so concurrent clients of the same model coalesce into
  one device program.
- :func:`make_http_server` — a dependency-free (stdlib
  `ThreadingHTTPServer`) JSON API in front of a ModelServer:

      GET  /healthz                     → {"status": "ok"}
      GET  /v1/models                   → model list + shapes
      GET  /v1/models/<name>/stats      → p50/p95 latency of that model
      POST /v1/models/<name>:predict    → {"predictions": [[...], ...]}
        body: {"graphs": [{"atom_type": [...], "adj": [[[...]]],
                           "node_feat": [[...]]? }, ...]}

  Each graph in a POST is submitted to the model's MicroBatcher
  individually, so graphs from different HTTP clients coalesce into
  the same device batch under load.

The reference has no serving at all (its only inference is
`run_exp.py -t`, SURVEY.md §2.1); this subsystem is the deployment
surface a production stack needs.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Mapping

import numpy as np

from lanczosnet_tpu.serve import MicroBatcher, Predictor


class ModelServer:
    """Named Predictors, each device-resident behind a MicroBatcher."""

    def __init__(self, max_delay_ms: float = 5.0, inflight: int = 1):
        self.max_delay_ms = max_delay_ms
        self.inflight = inflight
        self._batchers: dict[str, MicroBatcher] = {}
        self._predictors: dict[str, Predictor] = {}

    @classmethod
    def from_run_dirs(
        cls,
        runs: Mapping[str, str | Path],
        batch_size: int = 64,
        max_delay_ms: float = 5.0,
        warmup: bool = True,
        inflight: int = 1,
    ) -> "ModelServer":
        srv = cls(max_delay_ms=max_delay_ms, inflight=inflight)
        for name, run_dir in runs.items():
            # a directory produced by `lanczosnet-export` serves its
            # deserialized StableHLO program — no model code re-traced
            from lanczosnet_tpu.export import is_artifact_dir, load_predictor

            if is_artifact_dir(run_dir):
                predictor = load_predictor(run_dir)
            else:
                predictor = Predictor.from_run_dir(
                    run_dir, batch_size=batch_size
                )
            srv.add_model(name, predictor, warmup=warmup)
        return srv

    def add_model(
        self, name: str, predictor: Predictor, warmup: bool = True
    ) -> None:
        if warmup:
            predictor.warmup()  # compile before taking traffic
        self._predictors[name] = predictor
        self._batchers[name] = MicroBatcher(
            predictor, max_delay_ms=self.max_delay_ms, inflight=self.inflight
        )

    def models(self) -> list[dict]:
        return [
            {
                "name": name,
                "n_max": p.n_max,
                "batch_size": p.batch_size,
                "num_task": p.num_task,
            }
            for name, p in sorted(self._predictors.items())
        ]

    def predict(self, name: str, graphs: list[dict]) -> np.ndarray:
        """Blocking convenience: submit every graph through the model's
        batcher (so it coalesces with other clients) and gather."""
        mb = self._batchers[name]
        futs = [mb.submit(g) for g in graphs]
        return np.stack([f.result() for f in futs])

    def stats(self, name: str) -> dict:
        return self._batchers[name].latency_stats()

    def close(self) -> None:
        for mb in self._batchers.values():
            mb.close()


def _decode_graph(obj: dict) -> dict:
    g = {"atom_type": np.asarray(obj["atom_type"], np.int32),
         "adj": np.asarray(obj["adj"], np.float32)}
    if g["adj"].ndim == 2:  # single edge type sent flat
        g["adj"] = g["adj"][None]
    if obj.get("node_feat") is not None:
        g["node_feat"] = np.asarray(obj["node_feat"], np.float32)
    return g


_PREDICT_RE = re.compile(r"^/v1/models/([\w.-]+):predict$")
_STATS_RE = re.compile(r"^/v1/models/([\w.-]+)/stats$")


class _HTTPServer(ThreadingHTTPServer):
    # socketserver's default listen(5) backlog sheds connections the
    # moment >5 clients connect in the same scheduling quantum — the
    # r4 saturation sweep measured errors climbing 18 → 285 from 32 →
    # 128 clients from exactly this. A deep accept queue costs nothing
    # and lets bursts wait instead of getting RSTs.
    request_queue_size = 256
    daemon_threads = True


def make_http_server(
    server: ModelServer, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP front. ``port=0`` picks a free port —
    read it back from ``httpd.server_address``. Start with
    ``threading.Thread(target=httpd.serve_forever, daemon=True)`` or
    :func:`serve_forever_in_thread`."""

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: per-request TCP connects both add a
        # round trip per request and churn the accept queue under load
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet; latency lives in stats
            pass

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"status": "ok"})
            if self.path == "/v1/models":
                return self._json(200, {"models": server.models()})
            m = _STATS_RE.match(self.path)
            if m:
                name = m.group(1)
                if name not in server._batchers:
                    return self._json(404, {"error": f"no model {name!r}"})
                return self._json(200, server.stats(name))
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            m = _PREDICT_RE.match(self.path)
            if not m:
                return self._json(404, {"error": "not found"})
            name = m.group(1)
            if name not in server._batchers:
                return self._json(404, {"error": f"no model {name!r}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                graphs = [_decode_graph(g) for g in req.get("graphs", [])]
            except (KeyError, ValueError, TypeError) as exc:
                return self._json(400, {"error": f"bad request: {exc}"})
            if not graphs:
                return self._json(400, {"error": "empty graphs"})
            try:
                preds = server.predict(name, graphs)
            except Exception as exc:  # surface model errors as 500s
                return self._json(500, {"error": str(exc)})
            return self._json(200, {"predictions": preds.tolist()})

    return _HTTPServer((host, port), Handler)


def serve_forever_in_thread(httpd: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return t


def main(argv=None) -> None:
    """CLI: ``python -m lanczosnet_tpu.serve_http --model gcn=exp/...
    --model lnet=exp/... --port 8000``."""
    import argparse

    ap = argparse.ArgumentParser(description="LanczosNet-TPU model server")
    ap.add_argument(
        "--model", action="append", required=True, metavar="NAME=RUN_DIR",
        help="model name and trained run directory (repeatable)",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument(
        "--inflight", type=int, default=1,
        help="MicroBatcher dispatched-but-unfetched pipeline depth; 1 "
             "(default) measured fastest at saturation — fuller batches "
             "beat deeper pipelining on a dispatch-latency-bound link",
    )
    ap.add_argument(
        "--native", action="store_true",
        help="serve through the C++ epoll front (serve_native.py; "
             "~3x the stdlib front's saturation throughput, binary "
             "wire support) — falls back loudly if the .so won't build",
    )
    args = ap.parse_args(argv)

    runs = dict(spec.split("=", 1) for spec in args.model)
    srv = ModelServer.from_run_dirs(
        runs, batch_size=args.batch_size, max_delay_ms=args.max_delay_ms,
        inflight=args.inflight,
    )
    if args.native:
        from lanczosnet_tpu.serve_native import NativeFront

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
        return
    httpd = make_http_server(srv, host=args.host, port=args.port)
    host, port = httpd.server_address
    print(f"serving {sorted(runs)} on http://{host}:{port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()


if __name__ == "__main__":
    main()
