"""Config system + the nine shipped YAMLs (golden-file parsing,
SURVEY.md §4)."""

import pathlib

import pytest
import yaml

from lanczosnet_tpu.models import MODEL_REGISTRY, build_model
from lanczosnet_tpu.utils.config import AttrDict, load_config, parse_arguments

CONFIG_DIR = pathlib.Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.glob("qm8_*.yaml"))


def test_all_nine_configs_exist():
    names = {yaml.safe_load(p.read_text())["model"]["name"] for p in ALL_CONFIGS}
    assert names == set(MODEL_REGISTRY)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_loads_and_builds_model(path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(path)
    assert (pathlib.Path(cfg.save_dir) / "config.yaml").exists()
    mcfg = dict(cfg.model)
    mcfg.setdefault("num_atom", int(cfg.dataset.num_atom))
    mcfg["num_task"] = 16
    model = build_model(mcfg)
    assert type(model).__name__ == cfg.model.name


def test_attrdict_roundtrip():
    d = AttrDict.convert({"a": {"b": [1, {"c": 2}]}})
    assert d.a.b[1].c == 2
    plain = d.to_plain()
    assert not isinstance(plain["a"], AttrDict)
    assert plain["a"]["b"][1]["c"] == 2


def test_parse_arguments_flags():
    args = parse_arguments(["-c", "x.yaml", "-t", "-m", "note", "-l", "DEBUG"])
    assert args.config_file == "x.yaml"
    assert args.test and args.comment == "note" and args.log_level == "DEBUG"


def test_unknown_model_raises():
    with pytest.raises(KeyError, match="available"):
        build_model({"name": "NotAModel"})
