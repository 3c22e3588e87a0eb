"""Serialized inference artifacts (`jax.export` / StableHLO).

The reference's only deployment story is re-running its Python stack
(`[R] run_exp.py -t` needs the repo, torch, and the exact code
revision). This module turns a trained model into a self-contained
artifact directory:

    artifact/
      request_program.jaxexport   jax.export-serialized StableHLO of
                                  the FULL request program — params +
                                  packed batch -> predictions,
                                  including LanczosNet's on-device
                                  K-step Ritz precompute (the Pallas
                                  kernel on TPU)
      params.msgpack              flax-serialized trained parameters
      meta.json                   the packing contract (n_max,
                                  batch_size, operator kind, cluster
                                  count, label stats, task width) plus
                                  the producing jax version and
                                  export calling convention

Why this is the TPU-native shape of "deploy": the artifact pins the
*lowered* program, so a serving host needs neither the model code nor
the training config — `load_predictor` rebuilds a drop-in
:class:`~lanczosnet_tpu.serve.Predictor` that executes the exported
StableHLO (recompiled for the serving chip), and jax.export's
compatibility guarantees cover the custom calls it embeds. Artifacts
exported with ``platforms=("tpu", "cpu")`` run on either backend.

    from lanczosnet_tpu.serve import Predictor
    from lanczosnet_tpu.export import export_predictor, load_predictor

    export_predictor(Predictor.from_run_dir(run_dir), "artifact/")
    pred = load_predictor("artifact/")     # no model code needed
    y = pred.predict(graphs)               # same API, incl. MicroBatcher

CLI: ``lanczosnet-export <run_dir> -o <artifact_dir>``.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np
from flax import serialization as flax_ser
from jax import export as jax_export

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.data.dataset import LabelStats
from lanczosnet_tpu.serve import Predictor

# jax.export serializes the calling convention's pytree structure;
# custom nodes must be registered by a stable name. GraphBatch's
# auxdata is an empty tuple (flax.struct dataclass with all-data
# fields), so the payload is empty bytes.
try:
    jax_export.register_pytree_node_serialization(
        GraphBatch,
        serialized_name="lanczosnet_tpu.core.graph_batch.GraphBatch",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: (),
    )
except ValueError:  # already registered (module re-import)
    pass

_PROGRAM = "request_program.jaxexport"
_PROGRAM_COMPACT = "request_program_compact.jaxexport"
_PARAMS = "params.msgpack"
_META = "meta.json"
_FORMAT_VERSION = 1


def _probe_batch(predictor: Predictor):
    """One packed batch with the request program's exact arg shapes
    (ghost-padded to ``batch_size``, Ritz left for the device — the
    same packing :meth:`Predictor.predict` performs per request)."""
    from lanczosnet_tpu.data.dataset import pack_dataset
    from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs

    graphs = synthetic_qm8_graphs(
        1, seed=0, n_lo=4, n_hi=min(8, predictor.n_max)
    )
    dummy = np.zeros(predictor.num_task, np.float32)
    chunk = [{**graphs[0], "label": dummy}] * predictor.batch_size
    ds = pack_dataset(
        chunk,
        n_max=predictor.n_max,
        num_eig_vec=0,
        num_cluster=predictor.num_cluster,
        operator_kind=predictor.operator_kind,
    )
    return jax.tree.map(
        np.asarray, ds.slice_batch(np.arange(predictor.batch_size))
    )


def export_predictor(
    predictor: Predictor,
    out_dir: str | Path,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Serialize ``predictor``'s request program + params to ``out_dir``.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for an artifact that runs on either. NOTE:
    tracing happens on the CURRENT backend, so backend-dispatched ops
    (the Ritz precompute picks Pallas on TPU, the scan elsewhere) embed
    the current backend's lowering — export on the backend you serve
    on when the fast path matters.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    batch = _probe_batch(predictor)
    params = jax.tree.map(np.asarray, predictor.params)
    sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        (params, batch),
    )
    exported = jax_export.export(
        predictor._apply,
        platforms=tuple(platforms) if platforms else None,
    )(*sds)
    (out_dir / _PROGRAM).write_bytes(exported.serialize())
    (out_dir / _PARAMS).write_bytes(flax_ser.to_bytes(params))

    # also serialize the compact-wire program (raw uint8 adjacency +
    # on-device normalization, serve.py r5) when the predictor carries
    # one, so artifact serving keeps the 5× smaller request payload.
    # Additive: loaders without compact support ignore the extra file.
    has_compact = bool(getattr(predictor, "compact_wire", False))
    if has_compact:
        bs, n = predictor.batch_size, predictor.n_max
        e = int(batch.ops.shape[1]) - 1  # ops channels = merged + E raw
        fc = int(batch.node_feat.shape[-1])
        compact_sds = (
            sds[0],
            jax.ShapeDtypeStruct((bs, e, n, n), np.uint8),
            jax.ShapeDtypeStruct((bs, n), np.int32),
            jax.ShapeDtypeStruct((bs, n, fc), np.float32),
        )
        exported_c = jax_export.export(
            predictor._apply_compact,
            platforms=tuple(platforms) if platforms else None,
        )(*compact_sds)
        (out_dir / _PROGRAM_COMPACT).write_bytes(exported_c.serialize())

    meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "n_max": predictor.n_max,
        "batch_size": predictor.batch_size,
        "num_eig_vec": predictor.num_eig_vec,
        "num_cluster": predictor.num_cluster,
        "operator_kind": predictor.operator_kind,
        "num_task": predictor.num_task,
        "label_mean": (
            np.asarray(predictor.stats.mean).tolist()
            if predictor.stats is not None else None
        ),
        "label_std": (
            np.asarray(predictor.stats.std).tolist()
            if predictor.stats is not None else None
        ),
    }
    (out_dir / _META).write_text(json.dumps(meta, indent=1))
    return out_dir


class ArtifactPredictor(Predictor):
    """A :class:`Predictor` rebuilt from a serialized artifact — same
    ``predict``/``warmup`` API (so :class:`~lanczosnet_tpu.serve.
    MicroBatcher` and the HTTP front take it unchanged), but the
    request program is the deserialized StableHLO: no model code, no
    config, no Python re-trace of the model."""

    def __init__(self, exported, params, meta: dict, exported_compact=None):
        from lanczosnet_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.model = None
        self.params = jax.device_put(params)
        self.n_max = int(meta["n_max"])
        self.batch_size = int(meta["batch_size"])
        self.num_eig_vec = int(meta["num_eig_vec"])
        self.num_cluster = int(meta["num_cluster"])
        self.operator_kind = str(meta["operator_kind"])
        self.num_task = int(meta["num_task"])
        self.stats = None
        if meta.get("label_mean") is not None:
            self.stats = LabelStats(
                mean=np.asarray(meta["label_mean"], np.float32),
                std=np.asarray(meta["label_std"], np.float32),
            )
        # exported.call is traceable — jit it so repeat requests hit
        # the same compiled-executable cache entry as a native Predictor
        self._apply = jax.jit(exported.call)
        # compact wire only when the artifact shipped the second
        # program (exported_compact set by load_predictor); legacy
        # artifacts keep the ops-stack wire
        self.compact_wire = False
        if exported_compact is not None:
            call_c = jax.jit(exported_compact.call)
            # match Predictor._apply_compact's (params, adj, atom,
            # feat) signature minus the self-bound params ordering
            self._apply_compact = call_c
            self.compact_wire = self.num_cluster == 0


def load_predictor(artifact_dir: str | Path) -> ArtifactPredictor:
    """Rebuild a drop-in Predictor from :func:`export_predictor` output."""
    artifact_dir = Path(artifact_dir)
    meta = json.loads((artifact_dir / _META).read_text())
    if int(meta.get("format_version", 0)) > _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta['format_version']} is newer than this "
            f"library understands ({_FORMAT_VERSION})"
        )
    exported = jax_export.deserialize(
        (artifact_dir / _PROGRAM).read_bytes()
    )
    backend = jax.default_backend()
    if backend not in exported.platforms:
        raise ValueError(
            f"artifact was exported for {exported.platforms} but the "
            f"current backend is {backend!r} — re-export on this backend "
            f"or pass platforms=({backend!r}, ...) at export time"
        )
    params = flax_ser.msgpack_restore(
        (artifact_dir / _PARAMS).read_bytes()
    )
    exported_compact = None
    compact_path = artifact_dir / _PROGRAM_COMPACT
    if compact_path.exists():
        exported_compact = jax_export.deserialize(compact_path.read_bytes())
        if backend not in exported_compact.platforms:
            exported_compact = None  # legacy program already validated
    return ArtifactPredictor(exported, params, meta, exported_compact)


def is_artifact_dir(path: str | Path) -> bool:
    """True when ``path`` looks like :func:`export_predictor` output."""
    p = Path(path)
    return (p / _PROGRAM).exists() and (p / _META).exists()


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Export a trained run to a self-contained "
        "StableHLO inference artifact"
    )
    ap.add_argument("run_dir", help="training run directory "
                    "(config.yaml + checkpoints/)")
    ap.add_argument("-o", "--out", required=True, help="artifact directory")
    ap.add_argument("--tag", default="best", help="checkpoint tag")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms (default: current "
        "backend), e.g. tpu,cpu",
    )
    args = ap.parse_args(argv)
    predictor = Predictor.from_run_dir(
        args.run_dir, tag=args.tag, batch_size=args.batch_size
    )
    platforms = args.platforms.split(",") if args.platforms else None
    out = export_predictor(predictor, args.out, platforms=platforms)
    meta = json.loads((out / _META).read_text())
    print(json.dumps({"artifact": str(out), **meta}))


if __name__ == "__main__":
    main()
