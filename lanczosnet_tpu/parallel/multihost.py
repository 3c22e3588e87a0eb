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
import numpy as np

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


def barrier(tag: str = "barrier") -> None:
    """Block until every process reaches this point (no-op when
    single-process). Needed wherever one process consumes a file another
    wrote — e.g. the end-of-training best-checkpoint restore: the
    primary's final `Checkpointer.save` is host-side work the jit
    collectives do NOT order against other hosts' file reads."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def global_put(x, sharding):
    """`jax.device_put` that also works when `sharding` spans processes.

    Single-process: exactly `device_put`. Multi-process: every process
    holds the FULL host array (the construction-time convention — graph
    building is deterministic and replicated), and each materializes
    only its addressable shards via `make_array_from_callback`, yielding
    one global jax.Array over the whole mesh. This is what lets the
    mesh builders in `parallel/mesh.py` run unchanged on a multi-host
    mesh (tests/test_multihost.py trains through them with 2 processes).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])