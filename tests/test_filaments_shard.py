"""Sharded filaments (rod mechanics + segment contact over 8 virtual
devices) matches the single-device app — config #4's distributed path
(the reference runs `scrap/Sperm.cpp` distributed like every app)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.driver.apps.filaments import FilamentsConfig, FilamentsSim
from mundy_tpu.parallel.filaments_shard import make_sharded_filaments_step

pytestmark = pytest.mark.slow


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("shard",))


def _cfg(**kw):
    base = dict(num_filaments=16, nodes_per_filament=8, segment_length=1.0,
                radius=0.25, box_size=18.0, bend_modulus=5.0,
                stretch_stiffness=200.0, diffusion_coeff=0.02,
                active_amplitude=0.2, wave_omega=20.0,
                dt=2e-4, num_steps=40, max_neighbors=24, cell_capacity=32,
                dtype="float64", chunk=256, log_every=1000)
    base.update(kw)
    return FilamentsConfig(**base)


def test_sharded_filaments_matches_single_device():
    mesh = _mesh()
    cfg = _cfg()
    sim = FilamentsSim(cfg)
    state0 = sim.init()
    shard_fn, step_fn, gather_fn = make_sharded_filaments_step(
        mesh, "shard", sim)
    sh = shard_fn(state0)

    # f64 cell-list path: all per-filament physics is shard-local and the
    # noise is gid-keyed, so trajectories are bit-identical until the
    # first IN-LOOP rebuild (measured: 2 steps exact) — there the subset
    # query orders candidate rows differently than the full search, and
    # the ~1e-16 contact-sum reorder amplifies through the stiff Hertzian
    # contacts (same summation-order caveat as the chromatin crosslinker
    # psum; the pair SET is identical)
    steps = 20
    ref = sim.run_block(state0, steps)
    jax.block_until_ready(ref.pos)
    sh = step_fn(sh, steps)
    pos_s, ovf = gather_fn(sh)
    assert not ovf
    np.testing.assert_allclose(pos_s, np.asarray(ref.pos), rtol=0,
                               atol=1e-7)

    # longer horizon stays finite and tracks
    ref = sim.run_block(ref, 20)
    jax.block_until_ready(ref.pos)
    sh = step_fn(sh, 20)
    pos_s, ovf = gather_fn(sh)
    assert not ovf
    assert np.isfinite(pos_s).all()
    np.testing.assert_allclose(pos_s, np.asarray(ref.pos), rtol=0,
                               atol=1e-4)


def test_sharded_filaments_active_swimmers_propel():
    """The active curvature wave + RFT anisotropy must produce net motion
    in the sharded engine too (the physics, not just the plumbing)."""
    mesh = _mesh()
    cfg = _cfg(num_filaments=8, diffusion_coeff=0.0, active_amplitude=0.6,
               wave_omega=60.0, dt=5e-4, youngs_modulus=1.0)
    sim = FilamentsSim(cfg)
    state0 = sim.init()
    shard_fn, step_fn, gather_fn = make_sharded_filaments_step(
        mesh, "shard", sim)
    sh = step_fn(shard_fn(state0), 200)
    pos_s, _ = gather_fn(sh)
    com0 = np.asarray(state0.pos).mean(axis=1)
    com1 = pos_s.mean(axis=1)
    # all filaments show net swimming displacement (the single-device
    # physics bar: test_app_filaments.test_active_wave_propels measures
    # ~1e-4 COM drift per few hundred steps at these amplitudes)
    moved = np.linalg.norm(com1 - com0, axis=1)
    assert (moved > 5e-5).all(), moved
