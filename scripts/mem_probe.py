#!/usr/bin/env python
"""AOT HBM-footprint probe for SparseCitationRunner programs.

Lowers + compiles the runner's exact train/eval programs WITHOUT
executing them and prints the compiler's buffer assignment (temp arena
/ argument / output bytes) next to the device's HBM capacity — the
fit/no-fit answer for a config in one compile instead of a full run.
This is how the 10M-node LanczosNet budget was debugged (r4): five
RESOURCE_EXHAUSTED training attempts at ~15 min each collapse into a
table of `temp_bytes` per program variant.

Compiles land in the persistent compilation cache
(`utils/cache.py:enable_compilation_cache`), so a probe followed by a
real run pays the remote compile once.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/mem_probe.py \
        -c configs/ten_million_sparse_lanczos_net.yaml
"""

from __future__ import annotations

import argparse
import json

import jax


def hbm_limit_bytes() -> int | None:
    """Per-device HBM capacity if the backend reports it."""
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_limit")) if stats else None
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument(
        "--cpu-mesh", type=int, default=0, metavar="N",
        help="probe on an N-device virtual CPU mesh (for multi-chip "
             "configs on a single-chip box; JAX backends init lazily, "
             "so forcing cpu + the host device count here is early "
             "enough as long as nothing touched jax.devices() yet)",
    )
    ap.add_argument(
        "--stub-precompute", action="store_true",
        help="replace the runner's Ritz precompute with zeros of the "
             "right shape/sharding: the probe only compiles programs, "
             "and EXECUTING the real sharded 10M-node Lanczos recursion "
             "on an oversubscribed CPU mesh trips XLA:CPU's hardcoded "
             "40 s collective-rendezvous termination (measured: the "
             "one-core dev box aborts mid-psum). Probe rows are "
             "unaffected — buffer plans depend on shapes only.",
    )
    args = ap.parse_args()

    if args.cpu_mesh:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        )
        jax.config.update("jax_platform_name", "cpu")

    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.runner import build_runner
    from lanczosnet_tpu.utils.config import load_config
    from lanczosnet_tpu.utils.logger import setup_logging
    from lanczosnet_tpu.utils.profiling import program_cost

    config = load_config(args.config, comment="mem_probe")
    setup_logging(f"{config.save_dir}/run.log", "INFO")
    if args.stub_precompute:
        import jax.numpy as jnp

        import lanczosnet_tpu.train.sparse_citation_runner as scr
        from lanczosnet_tpu.ops.sparse import RingOp

        def _stub_ritz(op, k, eps=1e-6):
            shard_axis = (
                op.axis if isinstance(op, RingOp) else op.gather_axis
            )
            val = jnp.zeros((k,), jnp.float32)
            vec = jnp.zeros((op.n, k), jnp.float32)
            if shard_axis is not None:
                # match the real recursion's vma type: node-sharded
                # ritz_vec rows vary over the mesh axis
                vec = jax.lax.pcast(vec, (shard_axis,), to="varying")
            return val, vec

        scr.sparse_lanczos_ritz = _stub_ritz
    runner = build_runner(config)
    if not hasattr(runner, "build_programs"):
        raise SystemExit(f"{type(runner).__name__} has no build_programs")

    tx, _ = build_optimizer(config.train, 1)
    state = runner.init_train_state(tx)
    data = (runner.x, runner.op, runner.extras, runner.labels, runner.splits)
    train_step, _scanned, accuracy = runner.build_programs(tx)

    limit = hbm_limit_bytes()
    ndev = int(config.train.get("num_devices", 1))
    backend = jax.default_backend()
    for name, fn, fargs in (
        ("train_step", train_step, (state, data)),
        ("eval", accuracy, (state.params, data, runner.splits["val"])),
    ):
        cost = program_cost(fn, *fargs)
        # Sharded programs: XLA's memory_analysis reports the PER-DEVICE
        # executable's buffers — exactly the per-chip budget a slice run
        # needs. Caveat for CPU-mesh probes of TPU configs: the CPU
        # lowering differs (no Mosaic kernels, collective-safe loops
        # fully unrolled, layout/padding rules differ), so treat the
        # numbers as the program's logical buffer plan, not a bit-exact
        # TPU arena size.
        row = {
            "program": name,
            "backend": backend,
            "num_devices": ndev,
            "shard": str(config.train.get("shard", "")) if ndev > 1 else "",
            **cost,
        }
        if limit:
            row["hbm_limit"] = limit
            need = sum(
                cost.get(k, 0)
                for k in ("temp_bytes", "argument_bytes", "output_bytes")
            )
            row["fits"] = need <= limit
            row["margin_gb"] = round((limit - need) / 1024**3, 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
