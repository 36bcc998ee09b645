"""Sharded granular DEM (parallel/granular_shard.py): density-balanced
z-slabs running frictional Hertzian contact with MIGRATING per-contact
tangential history, validated against the single-device GranularSim and
against the clustered-density acceptance shape (uniform slabs overflow,
balanced slabs complete)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.driver.apps.granular import GranularConfig, GranularSim
from mundy_tpu.parallel.granular_shard import make_granular_slab_step

pytestmark = pytest.mark.slow


def _mesh(d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"needs {d} virtual devices")
    return Mesh(np.array(devs[:d]), ("shard",))


def test_granular_shard_matches_single_chip():
    """Settling cloud with friction, 2 slabs, f64: sharded trajectories
    (including the tangential-history remap across every migrating rebuild)
    must match the single-device app to summation-order rounding. The
    window crosses several skin rebuilds with live contact history, so a
    dropped or mis-keyed history slot diverges far beyond tolerance."""
    n = 300
    cfg = GranularConfig(num_spheres=n, box_size=10.0, radius=0.5,
                         dt=5e-4, num_steps=250, normal_damping=100.0,
                         tang_damping=50.0, friction_coeff=0.5,
                         dtype="float64", chunk=512, log_every=10**6)
    sim = GranularSim(cfg)
    state = sim.init()
    rng = np.random.default_rng(7)
    pos = np.array(state.pos)
    pos[:, 2] = rng.uniform(0.6, 6.0, n)
    pos = jnp.asarray(pos)
    state = state.replace(pos=pos, ref_pos=pos)
    state = sim._rebuild(state)

    init_fn, step_fn, gather_fn = make_granular_slab_step(
        _mesh(2), "shard", n_total=n, box_size=cfg.box_size,
        radius=cfg.radius, density=cfg.density, gravity=cfg.gravity,
        friction_coeff=cfg.friction_coeff, normal_spring=cfg.normal_spring,
        normal_damping=cfg.normal_damping, tang_spring=cfg.tang_spring,
        tang_damping=cfg.tang_damping, wall_spring=cfg.wall_spring,
        dt=cfg.dt, skin=cfg.skin, max_neighbors=cfg.max_neighbors,
        cell_capacity=cfg.cell_capacity, dtype=jnp.float64)
    m_state = init_fn(np.asarray(state.pos), np.asarray(state.vel))
    assert not bool(np.any(np.asarray(jax.device_get(m_state["overflow"]))))

    steps = 250
    state = sim.run_block(state, steps)
    m_state = step_fn(m_state, steps)
    jax.block_until_ready(m_state["pos"])

    assert not bool(state.overflow)
    mp, mv, ovf = gather_fn(m_state)
    assert not ovf
    # migration actually happened: several rebuilds in the window
    assert int(np.max(np.asarray(
        jax.device_get(m_state["rebuild_count"])))) >= 3
    sp = np.asarray(state.pos)
    sv = np.asarray(state.vel)
    assert np.abs(sp - mp).max() < 1e-6, np.abs(sp - mp).max()
    assert np.abs(sv - mv).max() < 1e-5, np.abs(sv - mv).max()
    # frictional history is alive in the sharded settled contacts
    assert float(jnp.max(jnp.abs(m_state["tang"]))) > 0.0


def test_uniform_slabs_overflow_balanced_completes():
    """Bottom-clustered cloud (the granular steady state IS clustered —
    everything settles to the floor): uniform slabs overflow at init,
    density-balanced slabs complete with finite physics."""
    rng = np.random.default_rng(5)
    n, box = 2000, 20.0
    pos0 = np.zeros((n, 3))
    pos0[:, 0] = rng.uniform(1.0, box - 1.0, n)
    pos0[:, 1] = rng.uniform(1.0, box - 1.0, n)
    pos0[:, 2] = rng.uniform(0.6, 14.0, n)

    common = dict(n_total=n, box_size=box, radius=0.5, dt=1e-4,
                  skin=0.3, dtype=jnp.float64)
    mesh = _mesh(4)
    init_u, _step_u, _g = make_granular_slab_step(
        mesh, "shard", balance="uniform", **common)
    su = init_u(pos0)
    assert bool(np.any(np.asarray(jax.device_get(su["overflow"]))))

    init_b, step_b, gather_b = make_granular_slab_step(
        mesh, "shard", balance="balanced", **common)
    sb = init_b(pos0)
    assert not bool(np.any(np.asarray(jax.device_get(sb["overflow"]))))
    sb = step_b(sb, 50)
    jax.block_until_ready(sb["pos"])
    assert not bool(np.any(np.asarray(jax.device_get(sb["overflow"]))))
    mp, mv, ovf = gather_b(sb)
    assert not ovf
    assert np.isfinite(mp).all() and np.isfinite(mv).all()
    # falling under gravity: mean z decreased
    assert mp[:, 2].mean() < pos0[:, 2].mean()


def test_friction_dissipates_faster_than_frictionless_sharded():
    """The single-device grazing-collision physics check, on the sharded
    engine: with friction the oblique impact loses more KE."""
    mass = (4.0 / 3.0) * np.pi * 0.125

    def run(mu):
        init_fn, step_fn, gather_fn = make_granular_slab_step(
            _mesh(2), "shard", n_total=2, box_size=10.0, radius=0.5,
            gravity=0.0, friction_coeff=mu, dt=5e-5, skin=0.3,
            normal_spring=5e4, tang_spring=2e4, dtype=jnp.float64)
        # straddle the balanced z-boundary so the contact pair spans shards
        pos = np.asarray([[4.0, 5.0, 9.9], [5.2, 5.0, 10.1]])
        vel = np.asarray([[2.0, 1.0, 0.0], [-2.0, -1.0, 0.0]])
        s = init_fn(pos, vel)
        s = step_fn(s, 2000)
        _p, v, ovf = gather_fn(s)
        assert not ovf
        return float(0.5 * mass * (v**2).sum())

    ke_free = run(0.0)
    ke_fric = run(0.8)
    assert ke_fric < ke_free - 1e-6, (ke_fric, ke_free)
