"""Multi-host (multi-slice / DCN) initialization.

The reference never runs beyond one process (SURVEY.md §2.6). The
TPU-native multi-host story needs no communication code at all — only
process-group initialization; after `initialize()`, `jax.devices()`
spans every host's chips, the same `make_mesh()` covers them, and XLA
routes collectives over ICI within a slice and DCN across slices.

Exercised in CI by a REAL two-process group over a localhost
coordinator (tests/test_multihost.py): process_count/process_index,
global-vs-local device views, a psum crossing the process boundary,
and `is_primary()` gating exactly one checkpoint writer. Pod runs use
the same call with auto-detected arguments.
"""

from __future__ import annotations

from typing import Optional

import jax

from lanczosnet_tpu.utils.logger import get_logger


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the JAX process group (no-op when single-process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for manual clusters. Returns process count.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    get_logger().info(
        "process %d/%d, %d global device(s)",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0