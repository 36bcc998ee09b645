"""End-to-end slice: spheres app (BASELINE config #1) on CPU.

Physics sanity: overlaps relax, momentum-free drift, periodic containment,
rebuild trigger fires, Brownian motion diffuses at the right rate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.spheres import SpheresConfig, SpheresSim


def small_config(**kw):
    base = dict(
        num_spheres=200,
        box_size=10.0,
        radius=0.5,
        youngs_modulus=200.0,
        dt=2e-4,
        num_steps=50,
        skin=0.3,
        dtype="float64",
        chunk=256,
        log_every=1000,
    )
    base.update(kw)
    return SpheresConfig(**base)


def test_overlaps_relax():
    cfg = small_config(num_steps=400)
    sim = SpheresSim(cfg)
    state = sim.init()
    initial_overlap = sim.max_overlap(state)
    assert initial_overlap > 0  # random init has overlaps
    state = sim.run_block(state, 400)
    assert not bool(state.overflow)
    final_overlap = sim.max_overlap(state)
    assert final_overlap < 0.5 * initial_overlap


def test_positions_stay_in_box():
    cfg = small_config(num_steps=100)
    sim = SpheresSim(cfg)
    state = sim.run_block(sim.init(), 100)
    pos = np.asarray(state.pos)
    assert (pos >= 0).all() and (pos <= cfg.box_size).all()


def test_rebuilds_triggered():
    # Brownian motion guarantees displacement beyond skin/2 within the run
    cfg = small_config(diffusion_coeff=0.05, dt=1e-3)
    sim = SpheresSim(cfg)
    state = sim.init()
    state = sim.run_block(state, 300)
    assert int(state.rebuild_count) > 1  # particles moved beyond skin


def test_deterministic():
    cfg = small_config()
    sim = SpheresSim(cfg)
    s1 = sim.run_block(sim.init(), 20)
    s2 = sim.run_block(sim.init(), 20)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_brownian_diffusion_rate():
    """Mean-square displacement of ideal (non-interacting) Brownian spheres
    must follow <r^2> = 6 D t."""
    D = 0.1
    cfg = small_config(
        num_spheres=1500,
        box_size=200.0,  # dilute: no collisions
        radius=0.1,
        diffusion_coeff=D,
        dt=1e-3,
        num_steps=80,
        skin=0.5,
        chunk=2048,
    )
    sim = SpheresSim(cfg)
    state = sim.init()
    pos0 = np.asarray(state.pos).copy()
    n_steps = 80
    state = sim.run_block(state, n_steps)
    # unwrapped displacement via min-image (valid while rms << box/2)
    disp = np.asarray(sim.metric.sep(jnp.asarray(pos0), state.pos))
    msd = (disp**2).sum(axis=1).mean()
    expect = 6 * D * n_steps * cfg.dt
    assert np.isclose(msd, expect, rtol=0.1)


def test_energy_dissipation():
    """Overdamped dynamics: total Hertzian overlap energy must decrease."""
    cfg = small_config(num_steps=100)
    sim = SpheresSim(cfg)

    def energy(state):
        pos = state.pos
        idx = jnp.minimum(state.nmat.idx, cfg.num_spheres - 1)
        sep = sim.metric.sep(pos[:, None, :], pos[idx])
        d = jnp.linalg.norm(sep, axis=-1) - 2 * cfg.radius
        delta = jnp.where(state.nmat.mask & (d < 0), -d, 0.0)
        # Hertz energy ~ delta^{5/2}; each pair counted twice -> halve
        return float(jnp.sum(delta**2.5)) / 2

    state = sim.init()
    e0 = energy(state)
    state = sim.run_block(state, 100)
    e1 = energy(state)
    assert e1 < e0
