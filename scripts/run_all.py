#!/usr/bin/env python
"""Train every shipped config and write RESULTS.md.

The reference README's results table is its de-facto verification
(SURVEY.md §4/§6); this reproduces that artifact for our stack: all
nine QM8 models on the deterministic synthetic QM8-shaped dataset, plus
the citation configs, with wall-clock and throughput. Run on the TPU
box:  PYTHONPATH=.:/root/.axon_site python scripts/run_all.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_config(path: Path, overrides: dict) -> dict:
    from lanczosnet_tpu.train.runner import build_runner
    from lanczosnet_tpu.utils.config import load_config

    cfg = load_config(path)
    for dotted, v in overrides.items():
        node = cfg
        *parents, leaf = dotted.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = v
    t0 = time.perf_counter()
    result = build_runner(cfg).train()
    result["wall_s"] = round(time.perf_counter() - t0, 1)
    result["exp"] = path.stem
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qm8-epochs", type=int, default=30)
    ap.add_argument("--only", default="", help="substring filter on config name")
    ap.add_argument("--out", default=str(REPO / "RESULTS.md"))
    args = ap.parse_args()

    from lanczosnet_tpu.utils.logger import setup_logging

    setup_logging(None, "INFO")

    import jax

    from lanczosnet_tpu.utils.config import load_config as _load

    qm8, citation, sparse = [], [], []
    for path in sorted((REPO / "configs").glob("*.yaml")):
        if args.only and args.only not in path.stem:
            continue
        cfg_probe = _load(path)
        # a tp-tiled config needs at least tp devices (dp = devices // tp)
        ndev = max(
            int(cfg_probe.train.get("num_devices", 1)),
            int(cfg_probe.train.get("tp", 1)),
        )
        if ndev > len(jax.devices()):
            print(f"skip {path.stem}: needs {ndev} devices "
                  f"(have {len(jax.devices())})", flush=True)
            continue
        if path.stem.startswith("qm8"):
            res = run_config(path, {"train.max_epoch": args.qm8_epochs})
            qm8.append(res)
        elif cfg_probe.get("runner") == "SparseCitationRunner":
            res = run_config(path, {})
            sparse.append(res)
        else:
            res = run_config(path, {})
            citation.append(res)
        print(json.dumps(res), flush=True)

    lines = [
        "# RESULTS",
        "",
        "Produced by `scripts/run_all.py` on one TPU v5e chip. Datasets are",
        "the deterministic synthetic stand-ins (`data/qm8.py`,",
        "`data/citation.py`) — the real QM8/Planetoid files are not",
        "available offline (SURVEY.md §0); swap `dataset.source` to use",
        "them when present. Label MAE is in original (unstandardized)",
        "units of the synthetic targets.",
        "",
    ]
    if qm8:
        lines += [
            f"## QM8-shaped regression ({args.qm8_epochs} epochs, batch 64, "
            "2048/256/256 graphs)",
            "",
            "| config | val MAE | test MAE | wall s |",
            "|---|---|---|---|",
        ]
        for r in qm8:
            lines.append(
                f"| {r['exp']} | {r['best_val_mae']:.5f} | "
                f"{(r['test_mae'] if r['test_mae'] is not None else float('nan')):.5f}"
                f" | {r['wall_s']} |"
            )
        lines.append("")
    if citation:
        lines += [
            "## Citation node classification (Planetoid protocol, synthetic "
            "SBM at dataset scale)",
            "",
            "| config | val acc | test acc | wall s |",
            "|---|---|---|---|",
        ]
        for r in citation:
            lines.append(
                f"| {r['exp']} | {r['best_val_acc']:.4f} | "
                f"{r['test_acc']:.4f} | {r['wall_s']} |"
            )
        lines.append("")
    if sparse:
        lines += [
            "## Sparse full-graph path (COO segment-sum, "
            "SparseCitationRunner)",
            "",
            "Memory scales with edges instead of N² — the path for graphs",
            "beyond Pubmed (ROADMAP.md #2). All nine model families have",
            "sparse members; edge- and node-sharded modes in",
            "`tests/test_sparse_sharded.py` / `test_sparse_node_sharded.py`.",
            "",
            "| config | val acc | test acc | wall s |",
            "|---|---|---|---|",
        ]
        for r in sparse:
            lines.append(
                f"| {r['exp']} | {r['best_val_acc']:.4f} | "
                f"{r['test_acc']:.4f} | {r['wall_s']} |"
            )
        lines.append("")
    # Preserve manually-maintained sections (long-training flagships,
    # 100k-scale runs, bucketing experiment) below the auto tables.
    out_path = Path(args.out)
    if out_path.exists():
        old = out_path.read_text().splitlines()
        for marker in ("## Long-training flagships", "## Beyond-Pubmed"):
            idx = [i for i, l in enumerate(old) if l.startswith(marker)]
            if idx:
                lines += old[idx[0]:]
                break
    out_path.write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
