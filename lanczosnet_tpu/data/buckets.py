"""Size-bucketed packing — padding-waste control for varied graph sizes.

One global ``n_max`` (the default) compiles exactly one program but
pads every graph to the largest: QM8-shaped data (n ∈ [6, 28], mean
≈17, n_max 32) wastes ~45% of the ``[N, N]`` operator FLOPs/bytes on
padding. Bucketing packs each graph into the smallest configured bound
≥ its size; the scanned trainer then runs one compiled program PER
BUCKET per epoch — still fully static shapes (the TPU-idiomatic middle
ground between per-batch dynamic padding, which recompiles constantly,
and worst-case padding).

Label standardization stats are fit on the UNION of labels before
splitting into buckets so every bucket shares one scale.

Enabled with ``dataset.buckets: [16, 24, 32]`` (scanned trainer only;
the streaming per-step path keeps the single-``n_max`` contract).

Measured tradeoff (LanczosNet, synthetic QM8, 30 epochs, 1×v5e):
~1.45× faster wall-clock, but batches become size-homogeneous — when
targets correlate with graph size (strongly true for the synthetic
labels) that costs accuracy (0.034 → 0.041 test MAE) even with the
trainer's shuffled chunk interleaving. OFF by default; turn it on for
throughput-bound runs or datasets with size-independent targets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from lanczosnet_tpu.data.dataset import LabelStats, PackedDataset, pack_dataset


def bucket_of(n: int, bounds: Sequence[int]) -> int:
    """Smallest bound ≥ n; raises if the graph exceeds every bound."""
    for b in sorted(bounds):
        if n <= b:
            return b
    raise ValueError(f"graph has {n} nodes > largest bucket {max(bounds)}")


def pack_dataset_bucketed(
    graphs: Sequence[dict],
    bounds: Sequence[int],
    stats: Optional[LabelStats] = None,
    standardize: bool = False,
    min_count: int = 0,
    **pack_kwargs,
) -> tuple[dict[int, PackedDataset], Optional[LabelStats]]:
    """Graph dicts → {bucket_bound: PackedDataset}, shared label stats.

    Returns the (possibly fitted) stats so val/test reuse train's.
    Empty buckets are omitted. Buckets holding fewer than ``min_count``
    graphs are merged upward into the next bound (the trainer passes its
    batch size here — a bucket smaller than one batch would otherwise
    never produce a gradient step and its graphs would silently be
    excluded from training).
    """
    if standardize and stats is None:
        labels = np.stack([np.asarray(g["label"], np.float32) for g in graphs])
        stats = LabelStats.fit(labels)
    by_bucket: dict[int, list] = {}
    for g in graphs:
        by_bucket.setdefault(
            bucket_of(int(np.asarray(g["atom_type"]).shape[0]), bounds), []
        ).append(g)
    if min_count > 0:
        ordered = sorted(by_bucket)
        for i, bound in enumerate(ordered):
            if len(by_bucket.get(bound, ())) < min_count and i + 1 < len(ordered):
                by_bucket.setdefault(ordered[i + 1], []).extend(
                    by_bucket.pop(bound)
                )
        # undersized LARGEST bucket: merge downward into the previous
        # survivor (repacked at the larger bound so everything fits)
        ordered = sorted(by_bucket)
        if (
            len(ordered) > 1
            and len(by_bucket[ordered[-1]]) < min_count
        ):
            by_bucket[ordered[-1]].extend(by_bucket.pop(ordered[-2]))
    packed = {
        bound: pack_dataset(
            gs, n_max=bound, stats=stats, standardize=standardize, **pack_kwargs
        )
        for bound, gs in sorted(by_bucket.items())
    }
    return packed, stats
