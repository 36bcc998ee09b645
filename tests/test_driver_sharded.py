"""Multi-chip from the production entry point (driver/sharded.ShardedSim +
`main --devices N`): the reference's `mpirun -n N` role — same YAML, same
physics, any device count (`DefaultUnitTestMain.cpp:11`)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.driver.sharded import ShardedSim

pytestmark = pytest.mark.slow


def _need(d):
    if len(jax.devices()) < d:
        pytest.skip(f"needs {d} virtual devices")


def test_sharded_wrapper_spheres_matches_single_device():
    """ShardedSim('spheres', ..., 8) over TWO blocks (exercising the
    persisted step counter / held shard dict) matches one single-device
    20-step run — same keyed noise streams, same physics."""
    _need(8)
    from mundy_tpu.driver.apps.spheres import SpheresConfig, SpheresSim

    cfg = SpheresConfig(num_spheres=600, box_size=16.0, radius=0.5,
                        youngs_modulus=200.0, diffusion_coeff=0.05,
                        dt=2e-4, skin=0.4, dtype="float64", log_every=1000)
    single = SpheresSim(cfg)
    s0 = single.init()
    s_ref = single.run_block(s0, 20)

    runner = ShardedSim("spheres", SpheresSim(cfg), 8)
    s = runner.run_block(s0, 10)
    s = runner.run_block(s, 10)
    assert not bool(s.overflow)
    ref = np.asarray(s_ref.pos)
    got = np.asarray(s.pos)
    diff = ref - got
    diff -= cfg.box_size * np.round(diff / cfg.box_size)
    assert np.abs(diff).max() < 1e-7, np.abs(diff).max()
    assert int(s.step) == 20


def test_sharded_wrapper_lcp_matches_single_device():
    _need(8)
    from mundy_tpu.driver.apps.lcp_spheres import (LCPSpheresConfig,
                                                   LCPSpheresSim)

    n, radius = 512, 0.5
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.05) ** (1 / 3))
    cfg = LCPSpheresConfig(num_spheres=n, box_size=box, radius=radius,
                           dt=1e-3, max_allowable_overlap=1e-9,
                           dtype="float64", log_every=1000)
    single = LCPSpheresSim(cfg)
    s0 = single.init()
    s_ref = single.run_block(s0, 25)

    runner = ShardedSim("lcp_spheres", LCPSpheresSim(cfg), 8)
    s = runner.run_block(s0, 25)
    assert not bool(np.asarray(s.overflow).any())
    ref = np.asarray(s_ref.pos)
    got = np.asarray(s.pos)
    diff = ref - got
    diff -= box * np.round(diff / box)
    assert np.abs(diff).max() < 1e-5, np.abs(diff).max()


def test_sharded_wrapper_granular_runs_two_blocks():
    """Granular through the wrapper: the held dict carries tangential
    history across blocks; gather returns finite settled physics."""
    _need(2)
    from mundy_tpu.driver.apps.granular import GranularConfig, GranularSim

    cfg = GranularConfig(num_spheres=200, box_size=10.0, radius=0.5,
                         dt=5e-4, normal_damping=100.0, tang_damping=50.0,
                         dtype="float64", chunk=512, log_every=10**6)
    runner = ShardedSim("granular", GranularSim(cfg), 2)
    s = runner.init()
    rng = np.random.default_rng(3)
    pos = np.array(s.pos)
    pos[:, 2] = rng.uniform(0.6, 5.0, cfg.num_spheres)
    s = s.replace(pos=jnp.asarray(pos), ref_pos=jnp.asarray(pos))
    s = runner.run_block(s, 60)
    s = runner.run_block(s, 60)
    assert not bool(np.asarray(s.overflow).any())
    assert np.isfinite(np.asarray(s.pos)).all()
    assert int(s.step) == 120


def test_main_devices_end_to_end(tmp_path):
    """`main config.yaml --devices 8` runs sharded, writes results +
    checkpoints — the full CLI path."""
    _need(8)
    from mundy_tpu.driver.main import main

    yaml_path = tmp_path / "spheres.yaml"
    yaml_path.write_text(
        "app: spheres\n"
        "params:\n"
        "  num_spheres: 600\n"
        "  box_size: 16.0\n"
        "  radius: 0.5\n"
        "  youngs_modulus: 200.0\n"
        "  diffusion_coeff: 0.05\n"
        "  dt: 2.0e-4\n"
        "  num_steps: 20\n"
        "  skin: 0.4\n"
        "  dtype: float64\n"
        "  log_every: 1000\n")
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    rc = main([str(yaml_path), "--devices", "8",
               "--output-dir", str(out), "--output-every", "10",
               "--checkpoint-dir", str(ck)])
    assert rc == 0
    assert (out / "final.vtk").exists()
    assert any(f.startswith("ckpt_") for f in os.listdir(ck))
    meta = [f for f in os.listdir(ck) if f.endswith(".json")]
    assert meta
    step = json.loads((ck / meta[-1]).read_text())["step"]
    assert step == 20
