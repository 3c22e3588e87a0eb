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
    args = ap.parse_args()

    from lanczosnet_tpu.train.optim import build_optimizer
    from lanczosnet_tpu.train.runner import build_runner
    from lanczosnet_tpu.utils.config import load_config
    from lanczosnet_tpu.utils.logger import setup_logging
    from lanczosnet_tpu.utils.profiling import program_cost

    config = load_config(args.config, comment="mem_probe")
    setup_logging(f"{config.save_dir}/run.log", "INFO")
    runner = build_runner(config)
    if not hasattr(runner, "build_programs"):
        raise SystemExit(f"{type(runner).__name__} has no build_programs")

    tx, _ = build_optimizer(config.train, 1)
    state = runner.init_train_state(tx)
    data = (runner.x, runner.op, runner.extras, runner.labels, runner.splits)
    train_step, _scanned, accuracy = runner.build_programs(tx)

    limit = hbm_limit_bytes()
    for name, fn, fargs in (
        ("train_step", train_step, (state, data)),
        ("eval", accuracy, (state.params, data, runner.splits["val"])),
    ):
        cost = program_cost(fn, *fargs)
        row = {"program": name, **cost}
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
