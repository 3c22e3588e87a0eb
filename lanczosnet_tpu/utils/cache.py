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
        if jax.default_backend() == "cpu":
            # CPU AOT artifacts are machine-feature-specific (the remote
            # compile service's CPU differs from this host — loading its
            # cache entries risks SIGILL); CPU compiles are fast anyway.
            return
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unsupported backend/config — run uncached
        pass


def set_prng_impl(impl: str = "rbg") -> None:
    """Select the PRNG implementation (train.prng_impl).

    'rbg' is the TPU-native generator: dropout-mask generation with the
    default threefry costs ~12% of the flagship train step; rbg removes
    it (measured 146k → 168k graphs/s). Streams differ from threefry but
    remain fully deterministic per seed. No-op if keys already exist
    with another impl in exotic embedding scenarios — set early.
    """
    try:
        jax.config.update("jax_default_prng_impl", impl)
    except Exception:
        pass
