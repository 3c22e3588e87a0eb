"""Logging + structured metrics.

Parity with reference `utils/logger.py` (console + per-run file handler)
plus what the reference lacks (SURVEY.md §5 observability): a JSONL
metrics stream (`metrics.jsonl` in the run dir) that tools and the
benchmark harness can parse without scraping log text.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Optional


def setup_logging(
    log_file: Optional[str | Path] = None, level: str = "INFO"
) -> logging.Logger:
    """Configure the root framework logger: stream + optional file."""
    logger = logging.getLogger("lanczosnet_tpu")
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s | %(message)s", "%H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def get_logger(name: str = "lanczosnet_tpu") -> logging.Logger:
    return logging.getLogger(name)


class MetricsLogger:
    """Append-only JSONL metrics writer; one record per event.

    ``tensorboard_dir`` optionally mirrors every numeric field into a
    TensorBoard event file as scalar ``<event>/<field>`` (SURVEY.md §5
    "optional TensorBoard"; enable with ``train.tensorboard: true``).
    The step is the record's own ``epoch``/``step``/``iter`` field when
    present, else a per-event counter. JSONL stays the source of truth;
    the mirror degrades to a no-op if tensorboard isn't importable.
    """

    def __init__(
        self, path: str | Path, tensorboard_dir: str | Path | None = None
    ):
        # multi-host: the run dir is shared — exactly one writer, or the
        # JSONL interleaves across processes
        import jax

        self._primary = jax.process_index() == 0
        self.path = Path(path)
        self._f = None
        if self._primary:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")
        self._tb = None
        self._tb_counts: dict[str, int] = {}
        if tensorboard_dir is not None and self._primary:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(tensorboard_dir))
            except Exception:
                self._tb = None

    def log(self, event: str, **fields: Any) -> None:
        if self._f is None:  # non-primary process: no writer
            return
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            step = None
            for k in ("epoch", "step", "iter"):
                v = fields.get(k)
                if isinstance(v, (int, float)) and v == v:
                    step = int(v)
                    break
            if step is None:
                step = self._tb_counts.get(event, 0)
                self._tb_counts[event] = step + 1
            for k, v in fields.items():
                if (
                    isinstance(v, (int, float))
                    and not isinstance(v, bool)
                    and v == v
                ):
                    self._tb.add_scalar(f"{event}/{k}", v, step)
            self._tb.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
