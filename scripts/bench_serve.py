#!/usr/bin/env python
"""Serving saturation sweep: sustained req/s + batch occupancy vs load.

PARITY.md's serving section reports idle/contended latency percentiles;
this measures the OTHER axis the MicroBatcher exists for (VERDICT r3
next #7): sustained requests/second and how full the coalesced device
batches run as concurrency ramps. At saturation the deadline never
fires — batches fill to ``batch_size`` and N clients' requests ride one
compiled dispatch.

Protocol: an in-process ModelServer (flagship LanczosNet shapes, K=20
on-device Ritz, batch 64, 5 ms deadline) behind the stdlib HTTP front;
for each concurrency level C, C client threads POST single-graph
predict requests back-to-back for ``--window`` seconds. Reported per
level: completed req/s, client-side p50/p95 (full HTTP round trip),
and the batcher's occupancy delta (requests/batches) for exactly that
window. Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serve.py
"""

from __future__ import annotations

import argparse
import http.client
import json
import threading
import time

import numpy as np


def make_payloads(
    n_graphs: int, n_max: int, binary: bool = False
) -> list[bytes]:
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs

    graphs = synthetic_qm8_graphs(n_graphs, seed=3, n_lo=8, n_hi=n_max - 4)
    if binary:
        from lanczosnet_tpu.serve_native import encode_graphs_binary

        return [encode_graphs_binary([g]) for g in graphs]
    payloads = []
    for g in graphs:
        payloads.append(
            json.dumps(
                {
                    "graphs": [
                        {
                            "atom_type": np.asarray(g["atom_type"]).tolist(),
                            "adj": np.asarray(g["adj"]).tolist(),
                        }
                    ]
                }
            ).encode()
        )
    return payloads


def client_loop(host, port, payloads, stop, out, idx):
    lat, done, errors = [], 0, 0
    i = idx  # stagger the request mix across clients
    conn = None  # HTTP/1.1 keep-alive: one persistent connection per
    # client (what a real client library does); reconnect on failure
    while not stop.is_set():
        t0 = time.perf_counter()
        try:
            if conn is None:
                conn = http.client.HTTPConnection(host, port, timeout=30)
            conn.request(
                "POST",
                "/v1/models/lanczosnet:predict",
                body=payloads[i % len(payloads)],
                headers={"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            body = resp.read()
            if resp.status == 200 and (
                b"predictions" in body or body[:4] == b"LNP1"
            ):
                done += 1
                lat.append(time.perf_counter() - t0)
            else:
                errors += 1
        except Exception:
            errors += 1
            try:
                if conn is not None:
                    conn.close()
            except Exception:
                pass
            conn = None
        i += 1
    if conn is not None:
        try:
            conn.close()
        except Exception:
            pass
    out[idx] = (done, errors, lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=float, default=8.0)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--deadline-ms", type=float, default=5.0)
    ap.add_argument(
        "--concurrency", type=str, default="1,4,8,16,32,64",
        help="comma-separated client counts",
    )
    ap.add_argument(
        "--inflight", type=int, default=1,
        help="MicroBatcher dispatched-but-unfetched depth (1 measured "
             "fastest at saturation — see --inflight-sweep)",
    )
    ap.add_argument(
        "--legacy-wire", action="store_true",
        help="disable the compact uint8 request wire (A/B baseline)",
    )
    ap.add_argument(
        "--direct", action="store_true",
        help="skip the HTTP front: clients submit to the MicroBatcher "
             "in-process (isolates the batcher+device ceiling from the "
             "HTTP/GIL one)",
    )
    ap.add_argument(
        "--native", action="store_true",
        help="serve through the C++ epoll front (serve_native.py) "
             "instead of the stdlib ThreadingHTTPServer",
    )
    ap.add_argument(
        "--binary", action="store_true",
        help="clients send the binary graph codec instead of JSON "
             "(native front decodes both; measures the json tax)",
    )
    ap.add_argument(
        "--ab-wire", action="store_true",
        help="run every concurrency level twice — binary codec then "
             "JSON — in ONE process (same tunnel weather, same compiled "
             "program), tagging rows with \"wire\"; the honest A/B for "
             "the C++ JSON transcode",
    )
    ap.add_argument(
        "--inflight-sweep", type=str, default=None, metavar="DEPTHS",
        help="comma-separated MicroBatcher pipeline depths; rebuilds "
             "ModelServer+front per depth IN ONE PROCESS (the jit cache "
             "stays warm, so only the first depth pays the remote "
             "compile) and runs the FIRST --concurrency level at each — "
             "measures whether the tunnel-dispatch ceiling lifts with a "
             "deeper dispatched-but-unfetched pipeline",
    )
    args = ap.parse_args()

    from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl

    enable_compilation_cache()
    set_prng_impl()

    import jax

    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
    from lanczosnet_tpu.models import build_model
    from lanczosnet_tpu.serve import Predictor
    from lanczosnet_tpu.serve_http import (
        ModelServer,
        make_http_server,
        serve_forever_in_thread,
    )

    N_MAX, K = 32, 20
    model = build_model(
        {
            "name": "LanczosNet",
            "num_atom": 8,
            "num_task": 16,
            "hidden_dim": [128, 128, 128],
            "embed_dim": 128,
            "short_diffusion_dist": [1, 2, 3],
            "long_diffusion_dist": [5, 7, 10, 20, 30],
            "num_eig_vec": K,
            "spectral_filter_kind": "MLP",
        }
    )
    probe = pack_dataset(
        synthetic_qm8_graphs(2, seed=0, n_lo=4, n_hi=8), n_max=N_MAX,
        num_eig_vec=K,
    )
    batch = jax.tree.map(np.asarray, probe.slice_batch(np.arange(2)))
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)[
        "params"
    ]
    pred = Predictor(
        model, params, n_max=N_MAX, batch_size=args.batch_size,
        num_eig_vec=K, compact_wire=not args.legacy_wire,
    )
    def make_front(srv):
        if args.native:
            from lanczosnet_tpu.serve_native import NativeFront

            front = NativeFront(srv, port=0)
            return None, front, front.host, front.port
        httpd = make_http_server(srv)
        serve_forever_in_thread(httpd)
        host, port = httpd.server_address
        return httpd, None, host, port

    direct_graphs = (
        synthetic_qm8_graphs(64, seed=3, n_lo=8, n_hi=N_MAX - 4)
        if args.direct else None
    )
    payloads = make_payloads(64, N_MAX, binary=args.binary)

    def run_level(c, srv, host, port, payloads=payloads):
        def direct_loop(stop, out, idx):
            mb = srv._batchers["lanczosnet"]
            lat, done, errors = [], 0, 0
            i = idx
            while not stop.is_set():
                t0 = time.perf_counter()
                try:
                    mb.submit(
                        direct_graphs[i % len(direct_graphs)]
                    ).result(timeout=30)
                    done += 1
                    lat.append(time.perf_counter() - t0)
                except Exception:
                    errors += 1
                i += 1
            out[idx] = (done, errors, lat)

        before = srv.stats("lanczosnet")
        stop = threading.Event()
        out: dict = {}
        threads = [
            threading.Thread(
                target=direct_loop, args=(stop, out, i)
            )
            if args.direct
            else threading.Thread(
                target=client_loop, args=(host, port, payloads, stop, out, i)
            )
            for i in range(c)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(args.window)
        stop.set()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        done = sum(v[0] for v in out.values())
        errors = sum(v[1] for v in out.values())
        lat = np.asarray(sum((v[2] for v in out.values()), []), np.float64)
        after = srv.stats("lanczosnet")
        d_req = after.get("count", 0) - before.get("count", 0)
        d_batch = after.get("batches", 0) - before.get("batches", 0)
        return {
            "clients": c,
            "req_per_sec": round(done / dt, 1),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1)
            if lat.size else None,
            "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1)
            if lat.size else None,
            "errors": errors,
            "mean_batch_occupancy": round(d_req / d_batch, 2)
            if d_batch else None,
        }

    if args.ab_wire:
        both = {
            "binary": make_payloads(64, N_MAX, binary=True),
            "json": make_payloads(64, N_MAX, binary=False),
        }
        srv = ModelServer(
            max_delay_ms=args.deadline_ms, inflight=args.inflight
        )
        srv.add_model("lanczosnet", pred)
        httpd, front, host, port = make_front(srv)
        for c in [int(s) for s in args.concurrency.split(",")]:
            for wire, pl in both.items():
                row = run_level(c, srv, host, port, payloads=pl)
                row["wire"] = wire
                if front is not None and wire == "json":
                    # sanity: the C++ transcode actually carried the load
                    row["transcoded_total"] = front.transcoded()
                print(json.dumps(row), flush=True)
        if httpd is not None:
            httpd.shutdown()
        if front is not None:
            front.close()
        srv.close()
        if not args.inflight_sweep:  # both flags: fall through warm
            return

    if args.inflight_sweep:
        # one process: the first depth pays the remote compile (pred is
        # shared, the request program is jit-cached), later depths are
        # warm — comparable same-process, same-day rows. Repeat depths
        # in the DEPTHS list to interleave (e.g. 2,1,2,1) — process-to-
        # process and window-to-window drift on this box is bigger than
        # the effects being measured. Runs every --concurrency level at
        # each depth.
        rows = []
        for depth in [int(s) for s in args.inflight_sweep.split(",")]:
            srv = ModelServer(max_delay_ms=args.deadline_ms, inflight=depth)
            srv.add_model("lanczosnet", pred)
            httpd, front, host, port = make_front(srv)
            for c in [int(s) for s in args.concurrency.split(",")]:
                row = run_level(c, srv, host, port)
                row["inflight"] = depth
                rows.append(row)
                print(json.dumps(row), flush=True)
            if httpd is not None:
                httpd.shutdown()
            if front is not None:
                front.close()
            srv.close()
        best = max(rows, key=lambda r: r["req_per_sec"])
        print(
            f"best: {best['req_per_sec']} req/s at inflight "
            f"{best['inflight']} ({best['clients']} clients)"
        )
        return

    srv = ModelServer(max_delay_ms=args.deadline_ms, inflight=args.inflight)
    srv.add_model("lanczosnet", pred)  # warmup compiles the request path
    httpd, front, host, port = make_front(srv)
    rows = []
    for c in [int(s) for s in args.concurrency.split(",")]:
        row = run_level(c, srv, host, port)
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["req_per_sec"])
    print(
        f"saturation: {best['req_per_sec']} req/s at {best['clients']} "
        f"clients, mean batch occupancy {best['mean_batch_occupancy']}"
    )
    if httpd is not None:
        httpd.shutdown()
    if front is not None:
        front.close()
    srv.close()


if __name__ == "__main__":
    main()
