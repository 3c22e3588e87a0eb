"""ctypes bindings for the native graph packer (native/graphpack.cc).

The native library performs the host-side heavy lifting of packing —
padding + per-channel operator normalization over all graphs in
parallel — in one C++ pass. `pack_arrays` is a drop-in producer of the
same `{atom_type, ops, mask}` arrays as the numpy+jnp path
(`core.graph_batch.batch_graphs` + `ops.normalize.build_operator_stack`)
and is A/B-tested against it (tests/test_native.py).

The `.so` is built on demand with `make -C native` (g++ is part of the
image); if the toolchain or binary is unavailable everything falls back
to the pure-Python path, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgraphpack.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.graphpack_pack.restype = ctypes.c_int
        lib.graphpack_pack.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pack_arrays(
    graphs: Sequence[dict],
    n_max: int,
    kind: str = "sym",
    num_threads: int = 0,
) -> Optional[dict]:
    """Native pack: graph dicts → {atom_type, ops, mask} numpy arrays.

    Returns None if the native library is unavailable (caller falls back
    to the Python path). Raises ValueError on oversize graphs, matching
    `pad_graph`'s behavior.
    """
    lib = _load()
    if lib is None:
        return None
    g = len(graphs)
    n_nodes = np.asarray([gr["atom_type"].shape[0] for gr in graphs], np.int32)
    num_edge = int(graphs[0]["adj"].shape[0]) if g else 0
    atom_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(gr["atom_type"], np.int32) for gr in graphs])
    )
    atom_off = np.zeros(g + 1, np.int64)
    np.cumsum(n_nodes, out=atom_off[1:])
    adj_blocks = [np.asarray(gr["adj"], np.float32).ravel() for gr in graphs]
    adj_off = np.zeros(g + 1, np.int64)
    np.cumsum([b.size for b in adj_blocks], out=adj_off[1:])
    adj_flat = (
        np.ascontiguousarray(np.concatenate(adj_blocks))
        if adj_blocks
        else np.zeros(0, np.float32)
    )

    atom_out = np.empty((g, n_max), np.int32)
    ops_out = np.empty((g, num_edge + 1, n_max, n_max), np.float32)
    mask_out = np.empty((g, n_max), np.float32)
    rc = lib.graphpack_pack(
        g, n_nodes, atom_flat, atom_off, adj_flat, adj_off,
        num_edge, n_max, 0 if kind == "sym" else 1, num_threads,
        atom_out, ops_out, mask_out,
    )
    if rc == -1:
        big = int(n_nodes.max()) if g else 0
        raise ValueError(f"graph has {big} nodes > n_max={n_max}")
    if rc != 0:
        return None
    return {"atom_type": atom_out, "ops": ops_out, "mask": mask_out}
