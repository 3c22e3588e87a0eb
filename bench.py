#!/usr/bin/env python
"""Headline benchmark: LanczosNet QM8-shape training throughput.

Measures steady-state graphs/sec of the full jitted train step
(fwd + bwd + Adam update) on the flagship LanczosNet at the reference's
working point (batch 64, N_max 32, K=20 Ritz pairs, 3×128 hidden,
short scales [1,2,3], long scales [5,7,10,20,30], 16 tasks) on
whatever accelerator JAX exposes (the driver runs this on one real TPU
chip).

Baseline: the reference repo (lrjconan/LanczosNetwork) publishes NO
throughput numbers and its mount is empty on this box (SURVEY.md §0,
§6), so ``vs_baseline`` is measured against a faithful same-shape
PyTorch (CPU) training step implemented below — the closest available
stand-in for "the PyTorch reference on this box". Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 64
N = 32
K = 20
HID = [128, 128, 128]
TASKS = 16
SHORT = [1, 2, 3]
LONG = [5, 7, 10, 20, 30]
STEPS = 60
WARMUP = 5
SUM_DENSE = False  # --sum-dense: layer Dense as SumDense([h, prop])

# v5e peak: 197 bf16 TFLOP/s per chip. JAX f32 matmuls run single-pass
# bf16 on TPU by default, so this is the honest MXU ceiling for this
# program. Used only when the backend is TPU.
PEAK_TFLOPS = {"tpu": 197.0}


def _program_flops(compiled) -> float:
    """Total FLOPs of one compiled program from XLA's own cost model
    (0.0 when the backend doesn't report). NOTE: XLA counts a while
    loop's body ONCE, so for the scanned epoch this undercounts by the
    step count — reported for reference, MFU uses the analytic count."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def analytic_train_flops_per_graph() -> float:
    """Model FLOPs of one training step per graph at the bench config,
    from first principles: 2 FLOPs/MAC forward, ×3 for fwd+bwd (the
    standard dense-layer accounting; optimizer elementwise work is
    negligible). Matmul zero-padding waste is NOT counted — this is
    useful model FLOPs, so MFU is honest about padding too."""
    f = HID[0]
    per_layer_macs = 0.0
    n_parts = 1 + len(SHORT) + len(LONG) + 4  # self, short, long, edge ops
    for dim in HID:
        per_layer_macs += max(SHORT) * N * N * f          # short diffusion chain
        per_layer_macs += K * N * f + N * K * len(LONG) * f  # V^T X + recon
        per_layer_macs += len(LONG) * K * (2 * 16 + 16)   # filter bank MLPs
        per_layer_macs += 4 * N * N * f                   # per-edge-type hops
        per_layer_macs += N * (f * n_parts) * dim         # layer Dense
        f = dim
    readout_macs = N * f * (TASKS + 1)
    fwd = 2.0 * (per_layer_macs + readout_macs)
    return 3.0 * fwd  # fwd + bwd ≈ 3× fwd FLOPs


def bench_jax(dtype: str = "float32") -> dict:
    """Scanned-epoch training throughput (the runner's default path):
    whole dataset device-resident, `lax.scan` over device-shuffled
    batches (train.device_shuffle), only a PRNG key crossing the host
    per validation interval."""
    import jax
    import jax.numpy as jnp

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

    # The reference's QM8 train split is ~21.8k molecules; benching at
    # that scale (rounded to a batch multiple) matches its working
    # point, amortizes the per-dispatch host/tunnel tax over 340-step
    # epochs, AND keeps the bench honest about dataset-size-dependent
    # costs: the r3 2,048-graph stand-in hid that the per-step batch
    # gather slowed 2.4x at real scale (fixed by shuffle_epoch — see
    # PARITY.md "Resident-dataset gather wall").
    num_graphs = 21760
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
            "dtype": dtype,
            "sum_dense": SUM_DENSE,
        }
    )
    tx, _ = build_optimizer({"optimizer": "Adam", "lr": 1e-3}, 1)
    state = init_state(
        model, gather_batch(data, jnp.arange(BATCH)), tx, seed=0
    )
    # Steady-state measurement: E epochs per dispatch, matching the
    # runner's epoch-grouped scanned path (epochs between validations
    # run as one program, train.device_shuffle generates permutations
    # on device — the default runner configuration). One dispatch per
    # epoch re-pays the host tunnel latency every 12 ms and understates
    # the chip by ~25%.
    group = 10
    epochs_fn = make_scan_train_epochs(
        model, tx, num_graphs=num_graphs, batch_size=BATCH, epochs=group
    )
    key = jax.random.PRNGKey(0)

    # one program dispatch per group: the PRNG-key chain advances inside
    # the compiled program (a host-side jax.random.split is itself a
    # tiny jitted program and pays a full tunnel round trip per group)
    state, losses, key = epochs_fn(state, data, key)  # compile + warm
    jax.block_until_ready(losses)
    rounds = 2
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, losses, key = epochs_fn(state, data, key)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    n_graphs_run = rounds * group * steps_per_epoch * BATCH
    gps = n_graphs_run / dt

    # Device-only throughput: trace ONE extra group dispatch and divide
    # its work by the chip's busy time (top-level XLA-op interval union
    # = per-op self-time sum). Wall gps pays the host+tunnel dispatch
    # tax (~24% on this box, PARITY.md); reporting both makes MFU
    # movement attributable — chip regressions can't hide in host noise
    # and vice versa (VERDICT r3 weak #1).
    device_gps = None
    try:
        import tempfile

        from lanczosnet_tpu.utils.profiling import device_busy_seconds

        trace_dir = tempfile.mkdtemp(prefix="benchprof")
        with jax.profiler.trace(trace_dir):
            state, losses, key = epochs_fn(state, data, key)
            jax.block_until_ready(losses)
        busy = device_busy_seconds(trace_dir)
        if busy:
            device_gps = group * steps_per_epoch * BATCH / busy
    except Exception:
        pass

    flops_per_graph = analytic_train_flops_per_graph()
    achieved_tflops = gps * flops_per_graph / 1e12
    peak = PEAK_TFLOPS.get(jax.default_backend())
    return {
        "graphs_per_sec": gps,
        "device_only_graphs_per_sec": device_gps,
        "device_time_frac": gps / device_gps if device_gps else None,
        "tflops_per_sec": achieved_tflops,
        "mfu_pct": 100.0 * achieved_tflops / peak if peak else None,
        "device_mfu_pct": (
            100.0 * device_gps * flops_per_graph / 1e12 / peak
            if device_gps and peak else None
        ),
        "flops_per_graph": flops_per_graph,
    }


def bench_torch_cpu(steps: int = 6) -> float:
    """Same-shape eager PyTorch-CPU LanczosNet train step (baseline proxy)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(0)
    s_op = torch.randn(BATCH, N, N, generator=g) * 0.1
    s_op = 0.5 * (s_op + s_op.transpose(1, 2))
    x_idx = torch.randint(1, 8, (BATCH, N), generator=g)
    d = torch.rand(BATCH, K, generator=g) * 2 - 1
    v = torch.randn(BATCH, N, K, generator=g) / np.sqrt(N)
    label = torch.randn(BATCH, TASKS, generator=g)
    ops_e = torch.randn(BATCH, 4, N, N, generator=g) * 0.1

    class TorchLanczosNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(8, HID[0])
            dims = [HID[0]] + HID
            self.filters = nn.ModuleList()
            self.layers = nn.ModuleList()
            for li, h in enumerate(HID):
                in_dim = dims[li] * (1 + len(SHORT) + len(LONG) + 4)
                self.layers.append(nn.Linear(in_dim, h))
                self.filters.append(
                    nn.ModuleList(
                        [
                            nn.Sequential(nn.Linear(2, 16), nn.ReLU(), nn.Linear(16, 1))
                            for _ in LONG
                        ]
                    )
                )
            self.att = nn.Linear(HID[-1], 1)
            self.out = nn.Linear(HID[-1], TASKS)

        def forward(self, idx):
            h = self.embed(idx)
            for li, lin in enumerate(self.layers):
                parts = [h]
                cur = h
                for t in range(max(SHORT)):
                    cur = torch.bmm(s_op, cur)
                    if (t + 1) in SHORT:
                        parts.append(cur)
                vtx = torch.bmm(v.transpose(1, 2), h)
                for si, t in enumerate(LONG):
                    feat = torch.stack([d, d**t], -1)
                    f = self.filters[li][si](feat).squeeze(-1)
                    parts.append(torch.bmm(v, f.unsqueeze(-1) * vtx))
                for e in range(4):
                    parts.append(torch.bmm(ops_e[:, e], h))
                h = torch.relu(lin(torch.cat(parts, -1)))
            gate = torch.sigmoid(self.att(h))
            return (gate * self.out(h)).sum(1)

    model = TorchLanczosNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    lossf = nn.L1Loss()

    def one_step():
        opt.zero_grad()
        loss = lossf(model(x_idx), label)
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return steps * BATCH / dt


def main():
    # --dtype bfloat16 measures the mixed-precision flagship; the
    # driver runs plain `python bench.py`, so the recorded metric stays
    # the f32 default unless explicitly asked
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    # batch-scaling sweeps (VERDICT r4 weak #4: locate the op-count-
    # bound knee); the recorded headline stays the default batch 64 —
    # the reference's own working point — which is what the driver runs
    ap.add_argument("--batch", type=int, default=64)
    # the concat-free layer Dense (model.sum_dense) — the batch ≥ 128
    # layout-flip remedy; A/B'd by the r5 batch sweep
    ap.add_argument("--sum-dense", action="store_true")
    args = ap.parse_args()
    global BATCH, SUM_DENSE
    BATCH = args.batch
    SUM_DENSE = args.sum_dense
    r = bench_jax(args.dtype)
    gps = r["graphs_per_sec"]
    try:
        base = bench_torch_cpu()
    except Exception:
        base = float("nan")
    vs = gps / base if base == base and base > 0 else None
    print(
        json.dumps(
            {
                "metric": "lanczosnet_qm8_train_graphs_per_sec"
                + ("_bf16" if args.dtype == "bfloat16" else "")
                + (f"_b{BATCH}" if BATCH != 64 else "")
                + ("_sumdense" if SUM_DENSE else ""),
                "value": round(gps, 1),
                "unit": f"graphs/sec (batch {BATCH}, N=32, K=20, fwd+bwd+adam)",
                # NOT the reference: its mount is empty and it publishes
                # no numbers — this divides by the same-shape eager
                # PyTorch-CPU proxy implemented in this file.
                "vs_baseline": round(vs, 2) if vs else 0.0,
                "baseline": "same-shape eager PyTorch-CPU proxy (NOT the reference)",
                # absolute proxy throughput, so host-load drift in the
                # multiplier is attributable at a glance
                "baseline_graphs_per_sec": round(base, 1) if base == base else None,
                "tflops_per_sec": round(r["tflops_per_sec"], 2),
                "mfu_pct": round(r["mfu_pct"], 2) if r["mfu_pct"] else None,
                # chip-only throughput from a traced dispatch (XLA-op
                # self-time sum): the wall number minus host/tunnel tax
                "device_only_graphs_per_sec": (
                    round(r["device_only_graphs_per_sec"], 1)
                    if r["device_only_graphs_per_sec"] else None
                ),
                "device_time_frac": (
                    round(r["device_time_frac"], 3)
                    if r["device_time_frac"] else None
                ),
                "device_mfu_pct": (
                    round(r["device_mfu_pct"], 2)
                    if r["device_mfu_pct"] else None
                ),
                "flops_per_graph": round(r["flops_per_graph"]),
            }
        )
    )


if __name__ == "__main__":
    main()
