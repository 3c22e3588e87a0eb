#!/usr/bin/env python
"""Sparse-path step-time sweep: dtype x feature-width on one chip.

Measures the full sparse GCN train step (fwd + bwd + Adam) on a
synthetic million-node citation graph across ``model.dtype``
{float32, bfloat16} and feature widths F, to locate the bf16 crossover
the gather analysis predicts (PARITY.md "Sparse-path scatters"): each
COO edge gather/scatter reads or writes one F-wide node row, and HBM
serves them in 512 B transactions — at F=128 an f32 row is exactly one
transaction so bf16's half-rows buy nothing, while at F>=256 halving
the bytes halves the transactions per row and bf16 should win the
memory-bound step.

Timing protocol (CLAUDE.md): the measured unit is ONE jitted program
that scans `--steps` train steps; completion is forced by fetching the
final loss scalar (block_until_ready is unreliable over the axon
tunnel). Run-to-run variance on this box is ~±10%.

Usage (on the TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sparse.py \
        --nodes 1000000 --degree 2.5 --feat 128,256,512 --steps 10
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl


def build_step(model, tx, remat: str = ""):
    # Data enters as jit ARGUMENTS, never closure constants: a closed-over
    # 1M-node feature matrix is embedded in the serialized HLO and blows
    # the remote-compile service's request-size limit (HTTP 413, observed
    # at F=128: 512 MB of inline constants).

    # same knob as SparseCitationRunner's `train.remat`: recompute the
    # forward in the backward instead of saving the [E, F] gather
    # activations — the wide-F memory-wall breaker
    def fwd(p, x, op, dr):
        return model.apply(
            {"params": p}, x, op, deterministic=False, rngs={"dropout": dr}
        )

    if remat == "full":
        fwd = jax.checkpoint(fwd)
    elif remat == "dots":
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    # "layers" is a model-structure knob (clone(remat_layers=True) in
    # run_one): the per-layer nn.remat replays one layer at a time —
    # lower peak than the whole-forward checkpoint (mem_probe, 10M run)

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("n",))
    def scanned(state, data, n):
        x, op, labels, train_mask = data

        def step_body(state, _):
            params, opt_state, rng = state
            rng, dr = jax.random.split(rng)

            def loss_fn(p):
                logits = fwd(p, x, op, dr)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                )
                return jnp.sum(ce * train_mask) / jnp.maximum(
                    jnp.sum(train_mask), 1.0
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return (params, opt_state, rng), loss

        return jax.lax.scan(step_body, state, None, length=n)

    return scanned


def run_one(args, f: int, dt_name: str) -> dict:
    """Measure ONE (F, dtype) config; called in its own subprocess."""
    enable_compilation_cache()
    set_prng_impl()

    from lanczosnet_tpu.data.citation import synthetic_citation_edges
    from lanczosnet_tpu.models.base import compute_dtype
    from lanczosnet_tpu.models.sparse_nodes import SparseGCN
    from lanczosnet_tpu.ops.sparse import sparse_sym_operator

    graph = synthetic_citation_edges(
        args.nodes, num_class=10, feat_dim=f,
        avg_degree=args.degree, seed=7,
    )
    n = graph["features"].shape[0]
    op = sparse_sym_operator(graph["edges"], n)
    x = jnp.asarray(graph["features"])
    labels = jnp.asarray(graph["labels"].astype("int32"))
    mask = jnp.asarray(graph["train_mask"].astype("float32"))
    h = args.hidden or f
    dt = compute_dtype(dt_name)  # validates; typos raise
    dt_name = jnp.dtype(dt).name  # normalize ("bf16" -> "bfloat16")
    model = SparseGCN(hidden_dim=(h, h), num_class=10, dropout=0.5, dtype=dt)
    remat = args.remat
    if remat == "layers":
        model = model.clone(remat_layers=True)
    # features stored in the compute dtype, like the runner (r4)
    x = x.astype(dt)
    tx = optax.adam(1e-2)
    rng = jax.random.PRNGKey(0)
    # A config can exceed HBM (measured: F=512 f32 at 1M nodes — the
    # two saved [E, F] edge-gather activations alone are ~10 GB). The
    # memory wall is itself a result, and bf16's halved rows may fit
    # where f32 didn't; the OOM becomes a row, not a crash.
    try:
        params = model.init(
            {"params": rng, "dropout": rng}, x, op, deterministic=True
        )["params"]
        state = (params, tx.init(params), rng)
        data = (x, op, labels, mask)
        scanned = build_step(model, tx, remat)
        state, losses = scanned(state, data, args.steps)  # compile+warm
        float(losses[-1])
        t0 = time.perf_counter()
        state, losses = scanned(state, data, args.steps)
        final = float(losses[-1])  # forces completion
        dt_s = time.perf_counter() - t0
        ms = dt_s / args.steps * 1e3
        row = {
            "nodes": n, "edges": int(op.row.shape[0]), "F": f,
            "hidden": h, "dtype": dt_name, "ms_per_step": round(ms, 1),
            "loss": round(final, 4),
        }
        if remat:
            row["remat"] = remat
        # Roofline: XLA's cost model counts the scan body ONCE, so
        # bytes_accessed of the n-step program ≈ HBM traffic of one
        # step (+ small prologue) — divide by measured step time for
        # achieved GB/s vs the v5e's 819 GB/s peak. Shapes-only
        # lowering: post-first-call AOT compile is served from the jit
        # cache (CLAUDE.md).
        try:
            from lanczosnet_tpu.utils.profiling import program_cost

            abstract = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                (state, data),
            )
            cost = program_cost(scanned, abstract[0], abstract[1], n=args.steps)
            if cost.get("bytes_accessed"):
                gbps = cost["bytes_accessed"] / (ms / 1e3) / 1e9
                row["bytes_per_step"] = int(cost["bytes_accessed"])
                row["hbm_gbps"] = round(gbps, 1)
                row["hbm_pct_peak"] = round(100 * gbps / 819.0, 1)
        except Exception:
            pass
        return row
    except Exception as e:  # noqa: BLE001
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        row = {
            "nodes": n, "edges": int(op.row.shape[0]), "F": f,
            "hidden": h, "dtype": dt_name, "oom": True,
        }
        if remat:
            row["remat"] = remat
        return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--degree", type=float, default=2.5)
    ap.add_argument("--feat", type=str, default="128,256")
    ap.add_argument("--hidden", type=int, default=0,
                    help="hidden width (default: same as F)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--remat", type=str, default="",
                    choices=("", "full", "dots", "layers"),
                    help="rematerialize the forward in backward "
                         "(train.remat equivalent)")
    ap.add_argument("--bf16-scatter", action="store_true",
                    help="accumulate sorted backward scatters in bf16 "
                         "(sets LANCZOSNET_BF16_SCATTER for each config "
                         "subprocess; only affects bfloat16 rows)")
    ap.add_argument("--one", nargs=2, metavar=("F", "DTYPE"), default=None,
                    help="internal: run a single config in-process")
    args = ap.parse_args()

    if args.one is not None:
        print("ROW " + json.dumps(run_one(args, int(args.one[0]), args.one[1])),
              flush=True)
        return

    # One subprocess per config: a hard OOM wedges the axon TPU backend
    # for the rest of the process (measured: the very next PRNGKey
    # raises RESOURCE_EXHAUSTED), and the TPU is single-tenant anyway —
    # process isolation makes every config's 16 GB start from zero.
    import os
    import subprocess
    import sys

    results = []
    for f in [int(s) for s in args.feat.split(",")]:
        for dt_name in args.dtypes.split(","):
            cmd = [
                sys.executable, "-u", os.path.abspath(__file__),
                "--nodes", str(args.nodes), "--degree", str(args.degree),
                "--hidden", str(args.hidden), "--steps", str(args.steps),
                "--remat", args.remat,
                "--one", str(f), dt_name,
            ]
            env = dict(os.environ)
            env["LANCZOSNET_BF16_SCATTER"] = (
                "1" if args.bf16_scatter else "0"
            )
            res = subprocess.run(cmd, capture_output=True, text=True, env=env)
            row = None
            for line in res.stdout.splitlines():
                if line.startswith("ROW "):
                    row = json.loads(line[4:])
            if row is None:
                row = {"F": f, "dtype": dt_name, "failed": True,
                       "tail": (res.stdout + res.stderr)[-500:]}
            if args.bf16_scatter:
                row["bf16_scatter"] = True
            results.append(row)
            print(json.dumps(row), flush=True)

    # f32/bf16 ratio per F
    byf = {}
    for r in results:
        if "ms_per_step" in r:
            byf.setdefault(r["F"], {})[r["dtype"]] = r["ms_per_step"]
    for f, d in sorted(byf.items()):
        if "float32" in d and "bfloat16" in d:
            print(f"F={f}: bf16 speedup over f32 = "
                  f"{d['float32'] / d['bfloat16']:.2f}x")


if __name__ == "__main__":
    main()
