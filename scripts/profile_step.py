"""Per-op HLO profile of the bench train program (VERDICT r2 item 5).

Traces the EXACT program bench.py measures — the 10-epoch grouped
`lax.scan` train path at the bench config — with `jax.profiler`,
then converts the xplane via tensorboard_plugin_profile into the
framework-op-stats table (self-time per HLO op category), printed as
a markdown table for PARITY.md.

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
Re-analyze an existing trace without touching the TPU:
    python scripts/profile_step.py --parse-only /path/to/*.xplane.pb

The tensorboard_plugin_profile converter in this image is broken
(protobuf descriptor-version mismatch), so the analysis parses the
XSpace proto directly via TF's bundled `tsl` schema with the
pure-Python protobuf implementation, reconstructing op nesting from
the flattened "XLA Ops" timeline (a stack over [offset, offset+dur)
intervals) so self-time excludes children — the outer `while` (the
scanned epoch) otherwise double-counts the whole program.

Reference context: the upstream ([R] SURVEY.md §2.6) has no profiling
story at all; this is the per-op attribution the r2 verdict asked for
("which ops own the other 78% and why each is irreducible").
"""
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

OUT = "/tmp/jaxprof"


def build_state_and_epoch():
    import jax.numpy as jnp

    from bench import BATCH, HID, K, LONG, N, SHORT, TASKS

    from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl

    enable_compilation_cache()
    set_prng_impl()

    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
    from lanczosnet_tpu.models import build_model
    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.scan_epoch import (
        device_dataset,
        gather_batch,
        make_scan_train_epochs,
    )
    from lanczosnet_tpu.train.step import init_state

    num_graphs = 21760  # bench.py's real-QM8 scale
    steps_per_epoch = num_graphs // BATCH
    graphs = synthetic_qm8_graphs(num_graphs, seed=0, n_lo=8, n_hi=28)
    ds = pack_dataset(graphs, n_max=N, num_eig_vec=K, standardize=True)
    data = device_dataset(ds)

    model = build_model(
        {
            "name": "LanczosNet",
            "num_atom": 8,
            "num_task": TASKS,
            "hidden_dim": HID,
            "embed_dim": HID[0],
            "short_diffusion_dist": SHORT,
            "long_diffusion_dist": LONG,
            "num_eig_vec": K,
            "spectral_filter_kind": "MLP",
            "dropout": 0.1,
        }
    )
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    state = init_state(model, gather_batch(data, jnp.arange(BATCH)), tx, seed=0)
    del steps_per_epoch  # implied by num_graphs // BATCH inside the program
    group = 10
    epochs_fn = make_scan_train_epochs(
        model, tx, num_graphs=num_graphs, batch_size=BATCH, epochs=group
    )
    return state, data, epochs_fn


def _load_xspace(path):
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")
    from tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def analyze(path, steps=None, graphs_per_step=None, peak_tflops=197.0):
    """Aggregate per-op SELF time (children excluded) on the TPU plane."""
    xs = _load_xspace(path)
    tpu = next(p for p in xs.planes if p.name.endswith("TPU:0"))
    stat_name = {k: v.name for k, v in tpu.stat_metadata.items()}
    ops = next(l for l in tpu.lines if l.name == "XLA Ops")

    # Events on the "XLA Ops" line are a flattened tree ordered by start
    # offset; a parent strictly contains its children's intervals. Walk
    # with a stack, charging each event's duration against its parent's
    # self-time.
    events = sorted(ops.events, key=lambda e: e.offset_ps)
    recs = []  # (name, category, self_ps, flops, bytes)
    stack = []  # indices into recs of currently-open ancestors

    def stat_val(s):
        if s.str_value:
            return s.str_value
        if s.ref_value:
            return stat_name.get(s.ref_value, "")
        return s.uint64_value or s.int64_value or s.double_value

    for e in events:
        end = e.offset_ps + e.duration_ps
        while stack and stack[-1][0] <= e.offset_ps:
            stack.pop()
        em = tpu.event_metadata[e.metadata_id]
        stats = {}
        for s in list(em.stats) + list(e.stats):
            stats[stat_name.get(s.metadata_id, "")] = stat_val(s)
        idx = len(recs)
        recs.append(
            {
                "name": em.name.split(" = ")[0].lstrip("%"),
                "cat": stats.get("hlo_category", ""),
                "self_ps": float(e.duration_ps),
                "flops": float(stats.get("flops", 0) or 0),
                "bytes": float(stats.get("bytes_accessed", 0) or 0),
            }
        )
        if stack:
            recs[stack[-1][1]]["self_ps"] -= e.duration_ps
        stack.append((end, idx))

    cat = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # self_ps, flops, bytes, n
    for r in recs:
        c = cat[r["cat"] or r["name"].rstrip("0123456789.")]
        c[0] += max(r["self_ps"], 0.0)
        c[1] += r["flops"]
        c[2] += r["bytes"]
        c[3] += 1
    total_ps = sum(c[0] for c in cat.values())

    rows = []
    for name, (ps, fl, by, n) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        ms = ps / 1e9
        tf = fl / (ps / 1e12) / 1e12 if ps else 0.0  # TFLOP/s while running
        gbs = by / (ps / 1e12) / 1e9 if ps else 0.0  # GB/s while running
        rows.append((name, ms, 100 * ps / total_ps, n, fl / 1e9, tf, 100 * tf / peak_tflops, gbs))

    print(f"\ndevice total (self-time sum): {total_ps / 1e9:.2f} ms")
    if steps:
        per_step = total_ps / 1e9 / steps
        print(f"{steps} steps -> {per_step:.4f} ms/step device", end="")
        if graphs_per_step:
            print(f" = {graphs_per_step / (per_step / 1e3):,.0f} graphs/s device-only")
        else:
            print()
    print("\n| HLO category | self ms | % time | n ops | GFLOP | TFLOP/s | % peak | GB/s |")
    print("|---|---|---|---|---|---|---|---|")
    for name, ms, pct, n, gf, tf, pk, gbs in rows:
        if pct < 0.05:
            continue
        print(
            f"| {name} | {ms:.2f} | {pct:.1f}% | {n} | {gf:.1f} | "
            f"{tf:.1f} | {pk:.1f}% | {gbs:.0f} |"
        )
    return rows, total_ps


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--parse-only":
        analyze(sys.argv[2], steps=3400, graphs_per_step=64)
        return

    # --batch N: profile the bench program at a non-default batch (the
    # r5 batch-scaling sweep found MFU *halving* from batch 64 -> 128;
    # this is the attribution tool). Must be set before build_state_…
    # does its `from bench import BATCH`.
    if "--batch" in sys.argv:
        import bench

        bench.BATCH = int(sys.argv[sys.argv.index("--batch") + 1])

    import jax

    from bench import BATCH

    state, data, epochs_fn = build_state_and_epoch()

    state, losses, _ = epochs_fn(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    print("compiled; warm loss", float(losses[-1]))

    t0 = time.perf_counter()
    with jax.profiler.trace(OUT):
        state, losses, _ = epochs_fn(state, data, jax.random.PRNGKey(2))
        print("traced; loss", float(losses[-1]))
    print(f"trace wall {time.perf_counter() - t0:.2f}s")

    files = glob.glob(OUT + "/plugins/profile/*/*.xplane.pb")
    print("xplane files:", files)
    if not files:
        print("NO XPLANE — profiler produced nothing over this backend")
        return
    # 10 permutation groups x (21760/BATCH) steps inside one scan program
    analyze(sorted(files)[-1], steps=10 * (21760 // BATCH), graphs_per_step=BATCH)


if __name__ == "__main__":
    main()
