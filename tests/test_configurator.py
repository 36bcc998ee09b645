"""YAML configurator + CLI driver."""

import subprocess
import sys

import numpy as np
import pytest

from mundy_tpu.core.config import ConfigError
from mundy_tpu.driver.configurator import (
    available_apps,
    build_simulation,
    build_simulation_from_yaml,
)


def test_all_apps_registered():
    assert set(available_apps()) == {
        "spheres", "lcp_spheres", "rods", "filaments", "chromatin"
    }


def test_build_with_overrides(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("app: spheres\nparams:\n  num_spheres: 100\n  box_size: 12.0\n")
    cfg, sim = build_simulation_from_yaml(str(y), {"num_steps": 5})
    assert cfg.num_spheres == 100 and cfg.num_steps == 5


def test_unknown_app_lists_choices():
    with pytest.raises(ConfigError, match="available"):
        build_simulation({"app": "bogus"})


def test_unknown_param_rejected():
    with pytest.raises(ConfigError, match="unknown keys"):
        build_simulation({"app": "spheres", "params": {"nope": 1}})


def test_example_yamls_parse():
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    examples = glob.glob(os.path.join(repo, "examples", "*.yaml"))
    assert len(examples) >= 5
    for path in examples:
        from mundy_tpu.core.config import load_yaml

        spec = load_yaml(path)
        assert spec["app"] in available_apps()
        # validate params against schema (no sim construction for the big ones)
        from mundy_tpu.driver.configurator import _registry
        from mundy_tpu.core.config import config_from_dict

        cfg_cls, _ = _registry()[spec["app"]]
        config_from_dict(cfg_cls, spec.get("params", {}))
