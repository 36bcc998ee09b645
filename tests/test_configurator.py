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
        "spheres", "lcp_spheres", "rods", "filaments", "chromatin",
        "granular",
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


def test_driver_writes_results(tmp_path):
    """The driver must produce inspectable artifacts (the IOBroker results
    role, ref IOBroker.hpp:252): periodic trajectory frames + final VTK."""
    from mundy_tpu.driver.main import main
    from mundy_tpu.io.trajectory import TrajectoryReader

    y = tmp_path / "c.yaml"
    y.write_text("app: spheres\nparams:\n  num_spheres: 64\n"
                 "  box_size: 10.0\n  num_steps: 20\n  log_every: 100\n")
    out = tmp_path / "results"
    rc = main([str(y), "--output-dir", str(out), "--output-every", "5"])
    assert rc == 0
    with TrajectoryReader(str(out / "trajectory.mtrj")) as r:
        assert r.n == 64
        # initial frame + steps 5, 10, 15, 20
        assert r.num_frames == 5
        step, t, pos = r.read(r.num_frames - 1)
        assert step == 20
        assert np.isfinite(pos).all()
    assert (out / "final.vtk").exists()
    assert (out / "final.vtk").read_text().startswith("# vtk")


def test_driver_checkpoint_resume(tmp_path):
    """--checkpoint-every + --continue resumes from the saved step."""
    from mundy_tpu.driver.main import main

    y = tmp_path / "c.yaml"
    y.write_text("app: spheres\nparams:\n  num_spheres: 32\n"
                 "  box_size: 10.0\n  num_steps: 10\n  log_every: 100\n")
    ck = tmp_path / "ck"
    assert main([str(y), "--checkpoint-dir", str(ck),
                 "--checkpoint-every", "5", "--set", "num_steps=5"]) == 0
    assert main([str(y), "--checkpoint-dir", str(ck), "--continue"]) == 0


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
