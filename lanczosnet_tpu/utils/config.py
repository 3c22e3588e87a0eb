"""YAML config system.

Parity with reference `utils/arg_helper.py` (SURVEY.md §5 "config"):
same YAML shapes and key names (``exp_name``, ``runner``, ``seed``,
``dataset:``, ``model:``, ``train:``, ``test:``) so reference configs
port 1:1; same run-identity minting (``run_id``, ``save_dir`` under
``exp/<exp_name>/<run_id>``, config re-dumped into the run dir for
provenance). Differences, deliberate:

- attribute access via a 30-line :class:`AttrDict` instead of the
  ``easydict`` dependency;
- class selection happens in explicit registries
  (`models.MODEL_REGISTRY`, `train.runner.RUNNER_REGISTRY`), never
  ``eval()``;
- no ``use_gpu``/``gpus`` keys — device placement is the mesh's job
  (`parallel/mesh.py`); a ``train.num_devices`` key optionally caps it.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path
from typing import Any

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively applied on load."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def convert(obj: Any) -> Any:
        if isinstance(obj, dict):
            return AttrDict({k: AttrDict.convert(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(AttrDict.convert(v) for v in obj)
        return obj

    def to_plain(self) -> dict:
        def conv(o):
            if isinstance(o, dict):
                return {k: conv(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [conv(v) for v in o]
            return o

        return conv(self)


def load_config(
    path: str | Path,
    is_test: bool = False,
    make_run_dir: bool = True,
    comment: str = "",
) -> AttrDict:
    """Load a YAML config and mint run identity."""
    with open(path) as f:
        cfg = AttrDict.convert(yaml.safe_load(f))
    cfg.setdefault("seed", 1234)
    cfg.setdefault("exp_name", Path(path).stem)
    cfg.is_test = is_test
    tag = "test" if is_test else "train"
    cfg.run_id = f"{time.strftime('%Y%m%d_%H%M%S')}_{os.getpid()}_{tag}"
    if comment:
        cfg.comment = comment
    base = cfg.get("exp_dir", "exp")
    cfg.save_dir = str(Path(base) / cfg.exp_name / cfg.run_id)
    if make_run_dir:
        Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
        save_config(cfg, Path(cfg.save_dir) / "config.yaml")
    return cfg


def save_config(cfg: AttrDict, path: str | Path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_plain(), f, default_flow_style=False)


def parse_arguments(argv=None) -> argparse.Namespace:
    """CLI surface, same flags as the reference's run_exp.py."""
    p = argparse.ArgumentParser(description="lanczosnet_tpu experiment runner")
    p.add_argument("-c", "--config_file", required=True, help="path to YAML config")
    p.add_argument("-l", "--log_level", default="INFO", help="logging level")
    p.add_argument("-m", "--comment", default="", help="run comment")
    p.add_argument(
        "-t", "--test", action="store_true", help="run evaluation instead of training"
    )
    return p.parse_args(argv)
