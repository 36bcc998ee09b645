"""Granular DEM app: frictional Hertzian contact at app scale."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.granular import GranularConfig, GranularSim
import pytest

pytestmark = pytest.mark.slow


def test_settles_under_gravity_with_friction():
    cfg = GranularConfig(num_spheres=300, box_size=10.0, radius=0.5,
                         dt=5e-4, num_steps=6000, normal_damping=100.0,
                         tang_damping=50.0, dtype="float64",
                         chunk=512, log_every=10000)
    sim = GranularSim(cfg)
    state = sim.init()
    # shallow initial layer (z <= 4): settles within the simulated 3 s
    rng = np.random.default_rng(7)
    pos = np.array(state.pos)
    pos[:, 2] = rng.uniform(0.6, 4.0, pos.shape[0])
    pos = jnp.asarray(pos)
    state = state.replace(pos=pos, ref_pos=pos)
    state = sim._rebuild(state)
    # run() regrows capacities if the settled pile densifies past them
    state = sim.run(state, log=lambda s: None)
    jax.block_until_ready(state.pos)
    assert not bool(state.overflow)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    # settled: everything near/above the floor, low kinetic energy
    assert pos[:, 2].min() > 0.2  # floor holds (r=0.5, some compliance)
    ke_per = sim.kinetic_energy(state) / cfg.num_spheres
    # free fall from ~10 would carry KE/m ~ g*h ~ 100; settled piles dissipate
    assert ke_per < 5.0, ke_per
    # frictional history is alive in the settled pile's persistent contacts
    td = np.asarray(state.tang_disp)
    assert np.abs(td).max() > 0.0


def test_friction_dissipates_faster_than_frictionless():
    """Grazing collision: with friction the tangential relative motion is
    damped, so total KE after the encounter is lower than the mu=0 run."""
    def run(mu):
        cfg = GranularConfig(num_spheres=2, box_size=10.0, radius=0.5,
                             gravity=0.0, friction_coeff=mu, dt=5e-5,
                             num_steps=2000, dtype="float64", chunk=64,
                             log_every=10000)
        sim = GranularSim(cfg)
        state = sim.init()
        # approach head-on in x with opposite transverse (y) motion: the
        # oblique impact has tangential slip for friction to bite on
        pos = jnp.asarray([[4.0, 5.0, 5.0], [5.2, 5.0, 5.0]], jnp.float64)
        vel = jnp.asarray([[2.0, 1.0, 0.0], [-2.0, -1.0, 0.0]], jnp.float64)
        state = state.replace(pos=pos, vel=vel, ref_pos=pos)
        state = sim._rebuild(state)
        state = sim.run_block(state, 2000)
        return sim.kinetic_energy(state)

    ke_free = run(0.0)
    ke_fric = run(0.8)
    assert ke_fric < ke_free - 1e-6, (ke_fric, ke_free)
