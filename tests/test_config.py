"""Config system round-trip tests (reference: config/load_config.py)."""

import pytest

from gan_mpc_tpu.config import Config


def test_from_dict_and_attr_access():
    cfg = Config.from_dict(
        {"name": "mpc", "mpc": {"horizon": 5, "train": {"lr": 1e-4}}}
    )
    assert cfg.name == "mpc"
    assert cfg.mpc.horizon == 5
    assert cfg.mpc.train.lr == 1e-4
    assert cfg["mpc"]["horizon"] == 5


def test_round_trip():
    data = {"a": 1, "b": {"c": [1, 2, 3], "d": {"e": "x"}}}
    assert Config.from_dict(data).to_dict() == data
    cfg = Config.from_dict(data)
    assert Config.from_yaml_str(cfg.to_yaml()) == cfg


def test_replace_override():
    cfg = Config.from_dict({"mpc": {"horizon": 5, "history": 1}})
    cfg2 = cfg.replace(mpc__horizon=50)
    assert cfg2.mpc.horizon == 50
    assert cfg2.mpc.history == 1
    assert cfg.mpc.horizon == 5  # original untouched


def test_get_path_and_readonly():
    cfg = Config.from_dict({"a": {"b": 2}})
    assert cfg.get_path("a.b") == 2
    assert cfg.get_path("a.missing", "dflt") == "dflt"
    with pytest.raises(AttributeError):
        cfg.a = 3
