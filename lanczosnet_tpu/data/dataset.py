"""Packed fixed-shape datasets — the two-phase design of SURVEY.md §3.5.

Phase 1 (this module, host, one-off): graph dicts → one contiguous set
of padded numpy arrays (global static ``n_max``), with normalized
operator stacks, optional precomputed Ritz pairs (the LanczosNet D,V
the reference computes per-graph with scipy in `utils/data_helper.py`),
optional GPNN partition assignments, and label-standardization stats.
Saved as a single ``.npz`` per split.

Phase 2 (data/loader.py, per-step): pure array slicing into device
batches — no per-batch padding, no Python per-graph work, so the input
pipeline can never starve the TPU.

Unlike the reference — which pads to the *per-batch* max and re-derives
masks in `collate_fn` every step — everything variable-shape happens
exactly once, here.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np

from lanczosnet_tpu.core.graph_batch import GraphBatch, batch_graphs
from lanczosnet_tpu.ops.normalize import build_operator_stack

# Version of the pack FORMAT+SEMANTICS. The runner's persistent pack
# cache folds this into its digest, so bump it alongside ANY change
# that alters what pack_dataset produces for the same inputs (padding,
# operator normalization, the Ritz precompute / start vector, partition
# assignment, label standardization) — otherwise stale cached packs
# keep serving for unchanged configs.
PACK_FORMAT_VERSION = 2


@dataclass(frozen=True)
class LabelStats:
    """Per-task standardization stats; metrics report in original units."""

    mean: np.ndarray  # [T]
    std: np.ndarray  # [T]

    def standardize(self, y: np.ndarray) -> np.ndarray:
        return (y - self.mean) / self.std

    def unstandardize_mae(self, mae_std: np.ndarray) -> np.ndarray:
        """MAE computed on standardized labels → original-unit MAE."""
        return mae_std * self.std

    @staticmethod
    def fit(labels: np.ndarray, eps: float = 1e-8) -> "LabelStats":
        return LabelStats(
            mean=labels.mean(0),
            std=np.maximum(labels.std(0), eps),
        )


@dataclass
class PackedDataset:
    """A fully padded split resident in host memory as numpy arrays."""

    atom_type: np.ndarray  # [G, N] int32
    node_feat: np.ndarray  # [G, N, Fc] f32
    ops: np.ndarray  # [G, E+1, N, N] f32
    mask: np.ndarray  # [G, N] f32
    label: np.ndarray  # [G, T] f32 (standardized iff stats is not None)
    stats: Optional[LabelStats] = None
    ritz_val: Optional[np.ndarray] = None  # [G, K]
    ritz_vec: Optional[np.ndarray] = None  # [G, N, K]
    cluster: Optional[np.ndarray] = None  # [G, N] int32

    def __len__(self) -> int:
        return self.mask.shape[0]

    @property
    def n_max(self) -> int:
        return self.mask.shape[1]

    def slice_batch(self, idx: np.ndarray) -> GraphBatch:
        """Gather a batch of graph indices into a GraphBatch (numpy)."""
        return GraphBatch(
            atom_type=self.atom_type[idx],
            node_feat=self.node_feat[idx],
            ops=self.ops[idx],
            mask=self.mask[idx],
            label=self.label[idx],
            ritz_val=None if self.ritz_val is None else self.ritz_val[idx],
            ritz_vec=None if self.ritz_vec is None else self.ritz_vec[idx],
            cluster=None if self.cluster is None else self.cluster[idx],
        )


@functools.lru_cache(maxsize=None)
def _ritz_jit(k: int):
    """Module-cached jitted Ritz precompute (avoids a fresh jit wrapper —
    and a full retrace — on every pack/serve call)."""
    from lanczosnet_tpu.ops.lanczos_pallas import batched_lanczos_ritz_dispatch

    return jax.jit(lambda s, m: batched_lanczos_ritz_dispatch(s, m, k))


def _chunked_ritz(ops0: np.ndarray, mask: np.ndarray, k: int, chunk: int = 256):
    """Run the batched Lanczos precompute in fixed-size device chunks.

    The tail chunk is padded so at most two program shapes exist per K
    (jit caches on shape); small inputs use their own size instead of
    padding 4x to the default chunk (the serving hot path packs
    batch-size requests).
    """
    g = ops0.shape[0]
    chunk = min(chunk, g) or 1
    fn = _ritz_jit(k)
    # Dispatch every chunk before fetching anything: jit calls are
    # async, so the device works through the whole queue while the
    # host pads the next chunk, and the single device_get at the end
    # starts all D2H copies before blocking — on a tunnel-attached
    # chip the per-chunk fetch round trip (~0.1 s) otherwise
    # serializes with compute (measured: pack-time Ritz was the
    # dominant cost of runner start-up at QM8 scale).
    pending, keep = [], []
    for lo in range(0, g, chunk):
        s = ops0[lo : lo + chunk]
        m = mask[lo : lo + chunk]
        pad = chunk - s.shape[0]
        if pad:
            s = np.concatenate([s, np.zeros((pad,) + s.shape[1:], s.dtype)])
            m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
        pending.append(fn(s, m))
        keep.append(chunk - pad if pad else chunk)
    fetched = jax.device_get(pending)
    vals = [v[:n] for (v, _), n in zip(fetched, keep)]
    vecs = [q[:n] for (_, q), n in zip(fetched, keep)]
    return np.concatenate(vals), np.concatenate(vecs)


def pack_dataset(
    graphs: Sequence[dict],
    n_max: int,
    operator_kind: str = "sym",
    num_eig_vec: int = 0,
    num_cluster: int = 0,
    stats: Optional[LabelStats] = None,
    standardize: bool = False,
    use_native: bool = True,
) -> PackedDataset:
    """Graph dicts → PackedDataset.

    Args:
      graphs: list of graph dicts (see data/qm8.py schema).
      n_max: global static padding size.
      operator_kind: "sym" or "row" normalization for the operator stack.
      num_eig_vec: if >0, precompute K Ritz pairs of the channel-0
        operator per graph (LanczosNet's D, V).
      num_cluster: if >0, compute spectral partition assignments (GPNN).
      stats: reuse existing LabelStats (val/test must reuse train's).
      standardize: fit (if stats None) and apply label standardization.
      use_native: pad+normalize through the multithreaded C++ packer
        (data/native.py) when available; numpy+jnp fallback otherwise.
    """
    graphs = list(graphs)
    packed = None
    if use_native and graphs:
        from lanczosnet_tpu.data import native

        packed = native.pack_arrays(graphs, n_max, kind=operator_kind)
    if packed is not None:
        atom_type, ops, mask = (
            packed["atom_type"], packed["ops"], packed["mask"],
        )
        label = np.stack(
            [np.asarray(g["label"], np.float32) for g in graphs]
        )
        fc = (
            graphs[0].get("node_feat").shape[-1]
            if graphs[0].get("node_feat") is not None
            else 0
        )
        node_feat = np.zeros((len(graphs), n_max, fc), np.float32)
        if fc:
            for i, g in enumerate(graphs):
                nf = np.asarray(g["node_feat"], np.float32)
                node_feat[i, : nf.shape[0]] = nf
        host = {"atom_type": atom_type, "node_feat": node_feat}
    else:
        host = batch_graphs(graphs, n_max)
        mask = host["mask"].astype(np.float32)
        ops = np.asarray(
            build_operator_stack(host["adj"], mask, kind=operator_kind),
            dtype=np.float32,
        )
        label = host["label"]
    if standardize:
        if stats is None:
            stats = LabelStats.fit(label)
        label = stats.standardize(label).astype(np.float32)

    ritz_val = ritz_vec = cluster = None
    if num_eig_vec > 0:
        ritz_val, ritz_vec = _chunked_ritz(ops[:, 0], mask, num_eig_vec)
    if num_cluster > 0:
        from lanczosnet_tpu.data.partition import spectral_partition_batch

        cluster = spectral_partition_batch(ops[:, 0], mask, num_cluster)

    return PackedDataset(
        atom_type=host["atom_type"],
        node_feat=host["node_feat"],
        ops=ops,
        mask=mask,
        label=label,
        stats=stats if standardize else None,
        ritz_val=ritz_val,
        ritz_vec=ritz_vec,
        cluster=cluster,
    )


def save_packed(ds: PackedDataset, path: str | Path) -> None:
    """Persist a packed split as one compressed npz."""
    arrays = {
        "atom_type": ds.atom_type,
        "node_feat": ds.node_feat,
        "ops": ds.ops,
        "mask": ds.mask,
        "label": ds.label,
    }
    for name in ("ritz_val", "ritz_vec", "cluster"):
        v = getattr(ds, name)
        if v is not None:
            arrays[name] = v
    if ds.stats is not None:
        arrays["label_mean"] = ds.stats.mean
        arrays["label_std"] = ds.stats.std
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_packed(path: str | Path) -> PackedDataset:
    with np.load(path) as z:
        stats = None
        if "label_mean" in z:
            stats = LabelStats(mean=z["label_mean"], std=z["label_std"])
        return PackedDataset(
            atom_type=z["atom_type"],
            node_feat=z["node_feat"],
            ops=z["ops"],
            mask=z["mask"],
            label=z["label"],
            stats=stats,
            ritz_val=z["ritz_val"] if "ritz_val" in z else None,
            ritz_vec=z["ritz_vec"] if "ritz_vec" in z else None,
            cluster=z["cluster"] if "cluster" in z else None,
        )
