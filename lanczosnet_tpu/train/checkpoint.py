"""Checkpoint / resume.

Parity with reference `utils/train_helper.py:snapshot()/load_model()`
(SURVEY.md §5): periodic + best-on-val snapshots of the full training
state, restorable for resume and for `test()`. The reference pickles
torch state dicts; here the state is a JAX pytree serialized with
`flax.serialization` msgpack (chosen over orbax's async machinery:
checkpoints for this workload are a few MB, a synchronous atomic
write-rename is simpler and has no background-thread failure modes).

Layout inside the run dir:
    checkpoints/<tag>.msgpack       (tag ∈ latest, best, step_N, …)
    checkpoints/<tag>.meta.json     ({step, metric, …} for humans/tools)
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import flax.serialization
import jax


class Checkpointer:
    def __init__(self, run_dir: str | Path):
        self.dir = Path(run_dir) / "checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)

    def save(self, tag: str, state: Any, meta: Optional[dict] = None) -> Path:
        """Atomically write `state` (any pytree) under `tag`.

        Multi-host: only process 0 writes (the run dir is shared, and
        the state's arrays are replicated so one copy suffices); other
        processes return the would-be path untouched. Readers that race
        a writer must fence with `parallel.multihost.barrier()` — the
        runners do before their end-of-training best restore.
        """
        if jax.process_index() != 0:
            return self.dir / f"{tag}.msgpack"
        host_state = jax.device_get(state)
        payload = flax.serialization.msgpack_serialize(
            flax.serialization.to_state_dict(host_state)
        )
        path = self.dir / f"{tag}.msgpack"
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(payload)
        os.replace(tmp, path)
        if meta is not None:
            (self.dir / f"{tag}.meta.json").write_text(json.dumps(meta, indent=2))
        return path

    def restore(self, tag: str, target: Any) -> Any:
        """Restore into the structure of `target` (a freshly-inited state)."""
        payload = (self.dir / f"{tag}.msgpack").read_bytes()
        state_dict = flax.serialization.msgpack_restore(payload)
        return flax.serialization.from_state_dict(target, state_dict)

    def meta(self, tag: str) -> Optional[dict]:
        p = self.dir / f"{tag}.meta.json"
        return json.loads(p.read_text()) if p.exists() else None

    def exists(self, tag: str) -> bool:
        return (self.dir / f"{tag}.msgpack").exists()

    @staticmethod
    def restore_file(path: str | Path, target: Any) -> Any:
        """Restore from an explicit checkpoint path (test_model configs)."""
        payload = Path(path).read_bytes()
        state_dict = flax.serialization.msgpack_restore(payload)
        return flax.serialization.from_state_dict(target, state_dict)
