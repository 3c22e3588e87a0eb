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
    """Append-only JSONL metrics writer; one record per event."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
