"""Profiling / tracing — the observability subsystem (SURVEY.md §5).

The reference has no profiling hooks at all; its only timing signal is
log timestamps. Here:

- :func:`trace` — context manager around `jax.profiler` producing a
  Perfetto/TensorBoard-loadable trace directory (`trace/` in the run
  dir when `train.profile: true`).
- :class:`StepTimer` — `block_until_ready`-based wall timers feeding
  the graphs/sec + epoch-time metrics that BASELINE.json names.
- :func:`debug_nans` — scoped `jax_debug_nans` enabling, the
  sanitizer analog called out in SURVEY.md §5 (tests use it; in
  production it stays off because it forces synchronous dispatch).
- :func:`program_cost` — compiler-reported FLOPs / HBM traffic / buffer
  footprint of a jitted program, surfaced per compiled step into
  `metrics.jsonl` so throughput regressions are attributable (ROADMAP
  #7: "no flop/VMEM counters surfaced per program").
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path | None) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped NaN checking: any jitted op producing NaN raises."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def program_cost(fn, *args, **kwargs) -> dict:
    """XLA's own cost model for one jitted program: flops, bytes
    accessed (HBM traffic), and the compiled buffer footprint.

    ``fn`` must be a `jax.jit`-wrapped callable; lowering reuses the
    jit cache (and the persistent compilation cache), so calling this
    after the first step costs no extra compile. Returns ``{}`` on
    backends whose PJRT plugin doesn't expose cost analysis — callers
    log whatever comes back and lose nothing elsewhere.
    """
    try:
        compiled = fn.lower(*args, **kwargs).compile()
        out: dict = {}
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca:
            for src, dst in (
                ("flops", "flops"),
                ("bytes accessed", "bytes_accessed"),
            ):
                if src in ca:
                    out[dst] = float(ca[src])
        ma = compiled.memory_analysis()
        for attr, dst in (
            ("temp_size_in_bytes", "temp_bytes"),
            ("argument_size_in_bytes", "argument_bytes"),
            ("output_size_in_bytes", "output_bytes"),
            ("generated_code_size_in_bytes", "code_bytes"),
        ):
            v = getattr(ma, attr, None)
            if v is not None:
                out[dst] = int(v)
        return out
    except Exception:  # pragma: no cover - backend-dependent surface
        return {}


def load_xspace(path: str):
    """Parse one ``*.xplane.pb`` into an XSpace proto.

    The tensorboard_plugin_profile converter in this image is broken
    (protobuf descriptor-version mismatch), so we read TF's bundled
    `tsl` schema directly with the pure-Python protobuf implementation
    (scripts/profile_step.py does the full per-op table on top of the
    same loader).
    """
    import os
    import sys

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    tf_dir = "/opt/venv/lib/python3.12/site-packages/tensorflow"
    if tf_dir not in sys.path:
        sys.path.insert(0, tf_dir)
    from tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_busy_seconds(
    trace_dir: str | Path, plane_suffix: str = "TPU:0"
) -> Optional[float]:
    """Device-busy seconds on the accelerator plane of a jax trace.

    Events on the "XLA Ops" timeline are a flattened tree in which a
    parent op strictly contains its children's intervals, so the union
    of all intervals — the sum of top-level event durations — equals
    the per-op self-time sum: time the chip actually spent executing.
    Dividing work by this instead of wall time removes host + tunnel
    dispatch overhead (PARITY.md's ~24% device/wall gap), which is why
    bench.py reports both. Returns None when the trace or the
    accelerator plane is missing (e.g. CPU backend).
    """
    import glob

    files = sorted(
        glob.glob(str(Path(trace_dir) / "plugins" / "profile" / "*" / "*.xplane.pb"))
    )
    if not files:
        return None
    try:
        xs = load_xspace(files[-1])
        plane = next(
            (p for p in xs.planes if p.name.endswith(plane_suffix)), None
        )
        if plane is None:
            return None
        ops = next((l for l in plane.lines if l.name == "XLA Ops"), None)
        if ops is None or not ops.events:
            return None
        busy_ps, end = 0, -1
        for e in sorted(ops.events, key=lambda e: e.offset_ps):
            if e.offset_ps >= end:  # top-level: not inside an open parent
                busy_ps += e.duration_ps
                end = e.offset_ps + e.duration_ps
        return busy_ps / 1e12
    except Exception:  # pragma: no cover - proto surface varies by image
        return None


class StepTimer:
    """Wall-clock over device work: call .start(), then .stop(x) where
    x is an output of the timed computation (blocked on before reading
    the clock)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.total = 0.0
        self.count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
