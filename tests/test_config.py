import math
import os

import pytest
import yaml

from rise_sdf_tpu.config import (
    ConfigNode,
    load_config,
    parse_cli_overrides,
)


def _write(tmp_path, name, data):
    p = tmp_path / name
    with open(p, "w") as f:
        yaml.safe_dump(data, f)
    return str(p)


def test_attr_access_and_nested(tmp_path):
    cfg = load_config(_write(tmp_path, "a.yaml", {
        "model": {"radius": 1.5, "geometry": {"feature_dim": 48}},
    }))
    assert cfg.model.radius == 1.5
    assert cfg.model.geometry.feature_dim == 48
    assert cfg.model.get("missing", 7) == 7


def test_interpolation_and_resolvers(tmp_path):
    cfg = load_config(_write(tmp_path, "a.yaml", {
        "model": {"radius": 1.5,
                  "geometry": {"radius": "${model.radius}"}},
        "trainer": {"max_steps": 80000},
        "system": {
            "warmup_steps": 500,
            "gamma": "${calc_exp_lr_decay_rate:0.1,${sub:${trainer.max_steps},${system.warmup_steps}}}",
            "dim": "${add:${model.geometry.feature_dim},0}",
        },
        "name": "exp-${dataset.scene}",
        "dataset": {"scene": "lego"},
    }, ), cli_args=["model.geometry.feature_dim=48"])
    assert cfg.model.geometry.radius == 1.5
    assert cfg.system.dim == 48
    assert abs(cfg.system.gamma - 0.1 ** (1 / 79500)) < 1e-12
    assert cfg.name == "exp-lego"


def test_cli_override_types():
    o = parse_cli_overrides(["a.b=3", "a.c=true", "a.d=[1,2]", "a.e=hello"])
    assert o.a.b == 3 and o.a.c is True and o.a.d == [1, 2] and o.a.e == "hello"


def test_missing_mandatory(tmp_path):
    cfg = load_config(_write(tmp_path, "a.yaml", {"dataset": {"scene": "???"}}))
    with pytest.raises(ValueError):
        _ = cfg.dataset.scene


def test_merge_order(tmp_path):
    a = _write(tmp_path, "a.yaml", {"x": {"y": 1, "z": 2}})
    cfg = load_config(a, cli_args=["x.y=5"])
    assert cfg.x.y == 5 and cfg.x.z == 2


def test_reference_configs_load():
    """Our shipped configs must parse and resolve."""
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in os.listdir(root):
        if not name.endswith(".yaml"):
            continue
        cfg = load_config(os.path.join(root, name),
                          cli_args=["dataset.scene=lego"])
        assert cfg.model.name
