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

Measured tradeoffs (LanczosNet, synthetic QM8, 30 epochs, 1×v5e):

- r1, chunk-interleaved (``dataset.buckets`` alone): saves ~45% padded
  FLOPs but batches become size-homogeneous — when targets correlate
  with graph size that costs accuracy (0.0353 → 0.0432 test MAE, r2
  re-measurement).
- r2, mixed-size paired steps (``train.bucket_pair: true``,
  `train/scan_epoch.py:make_scan_pair_epoch`): each update averages
  gradients from half-batches of two buckets, restoring size-mixed
  batches — test MAE 0.0360, within 2% of unbucketed. Quality fixed.
- BUT on this box wall-clock LOSES either way (0.066 s/epoch unbucketed
  vs 0.31 chunked / 0.38 paired): the unbucketed trainer runs a whole
  validation interval as ONE dispatch, while bucketed paths dispatch
  per (bucket, chunk) piece through the ~33 ms TPU tunnel — dispatch
  latency, not FLOPs, is the binding constraint at QM8 scale. The FLOP
  saving only wins when per-program time dominates dispatch (much
  larger models/graphs, or directly-attached chips).

OFF by default. If you turn buckets on, also turn on
``train.bucket_pair`` — it removes the accuracy cost.
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
