"""Persistent XLA compilation cache.

First compilation of the jitted train step on a TPU chip costs tens of
seconds to minutes; every entry point (runner, bench, CLI) calls
:func:`enable_compilation_cache` so later processes reuse serialized
executables keyed by HLO. No-op if the backend doesn't support it.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT = os.path.expanduser("~/.cache/lanczosnet_tpu/xla")


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("LANCZOSNET_TPU_CACHE", _DEFAULT)
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unsupported backend/config — run uncached
        pass
