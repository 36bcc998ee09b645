"""Runtime load rebalance on the PRODUCTION LCP pipeline
(parallel/balanced_lcp.py): density-balanced z-slabs running the BBPGD
non-penetration solve, validated against the single-device LCPSpheresSim
and against the clustered-density acceptance shape of test_balanced_slab
(uniform slabs overflow, balanced slabs complete)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
from mundy_tpu.parallel.balanced_lcp import make_balanced_lcp_step

pytestmark = pytest.mark.slow


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("shard",))


def flat_pos(state, n):
    p = np.asarray(state["pos"]).reshape(-1, 3)
    g = np.asarray(state["gid"]).reshape(-1)
    v = np.asarray(state["valid"]).reshape(-1)
    out = np.zeros((n, 3))
    seen = np.zeros(n, int)
    out[g[v]] = p[v]
    np.add.at(seen, g[v], 1)
    return out, seen


def brute_max_overlap(pos, box, radius):
    n = pos.shape[0]
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1)) + np.eye(n) * 1e9
    return float(2 * radius - dist.min())


def test_balanced_lcp_matches_single_chip():
    """Same initial overlap problem, same solver settings: the balanced
    engine must reproduce the single-device trajectory to solver tolerance
    (LCP solutions are generically unique)."""
    n, radius = 512, 0.5
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.05) ** (1 / 3))
    tol = 1e-9
    cfg = LCPSpheresConfig(
        num_spheres=n, box_size=box, radius=radius, dt=1e-3,
        max_allowable_overlap=tol, diffusion_coeff=0.0, dtype="float64",
        num_steps=30)
    single = LCPSpheresSim(cfg)
    s_state = single.init()
    pos0 = np.asarray(s_state.pos)

    init_fn, step_fn = make_balanced_lcp_step(
        _mesh(), "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        max_allowable_overlap=tol, constraint_buffer=0.2,
        dtype=jnp.float64)
    m_state = init_fn(jax.random.PRNGKey(0), pos=pos0)
    assert not bool(np.any(np.asarray(jax.device_get(m_state["overflow"]))))

    steps = 30
    s_state = single.run_block(s_state, steps)
    m_state = step_fn(m_state, steps)
    jax.block_until_ready(m_state["pos"])

    assert not bool(s_state.overflow)
    assert not bool(np.any(np.asarray(jax.device_get(m_state["overflow"]))))
    sp = np.asarray(s_state.pos)
    mp, seen = flat_pos(m_state, n)
    assert np.all(seen == 1), "bodies lost or duplicated across rebalances"
    diff = sp - mp
    diff -= box * np.round(diff / box)
    assert np.abs(diff).max() < 1e-5, np.abs(diff).max()
    assert brute_max_overlap(mp, box, radius) < 1e-6


def _clustered_overlapping(rng, n, box, radius, frac=0.18):
    """Overlapping spheres packed into the bottom `frac` of the box in z:
    the clustered-density regime where uniform slabs die."""
    pos = np.zeros((n, 3))
    pos[:, 0] = rng.uniform(0, box, n)
    pos[:, 1] = rng.uniform(0, box, n)
    pos[:, 2] = rng.uniform(0, frac * box, n)
    return pos


def test_uniform_slabs_overflow_balanced_completes():
    """The test_balanced_slab acceptance shape, on the PRODUCTION LCP
    engine: a bottom-clustered config overflows uniform slabs at init
    (own capacity 1.5 * N/8 cannot hold ~N/2) but completes balanced with
    the overlaps resolved."""
    rng = np.random.default_rng(7)
    # sized so the balanced slabs stay thicker than the one-hop ghost
    # margin (cutoff + buffer/2 = 0.825): cluster depth 0.35 * box ~ 7.9
    # over 8 slabs ~ 0.99/slab — the engine's declared thin-slab limit
    n, radius = 2048, 0.3
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.02) ** (1 / 3))
    pos0 = _clustered_overlapping(rng, n, box, radius, frac=0.35)
    mesh = _mesh()

    init_u, _step_u = make_balanced_lcp_step(
        mesh, "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        constraint_buffer=0.15, balance="uniform", dtype=jnp.float64)
    su = init_u(jax.random.PRNGKey(0), pos=pos0)
    assert bool(np.any(np.asarray(jax.device_get(su["overflow"]))))

    init_b, step_b = make_balanced_lcp_step(
        mesh, "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        constraint_buffer=0.15, balance="balanced", dtype=jnp.float64)
    sb = init_b(jax.random.PRNGKey(0), pos=pos0)
    assert not bool(np.any(np.asarray(jax.device_get(sb["overflow"]))))
    sb = step_b(sb, 25)
    jax.block_until_ready(sb["pos"])
    assert not bool(np.any(np.asarray(jax.device_get(sb["overflow"]))))
    mp, seen = flat_pos(sb, n)
    assert np.all(seen == 1)
    # overlaps resolved to near-tolerance by the distributed solve
    assert brute_max_overlap(mp, box, radius) < 1e-3


def test_balanced_lcp_brownian_runs():
    """Brownian drift in the constant term (the north-star config's
    physics) over the balanced engine: steps stay finite, no overflow,
    non-penetration maintained to the per-step drift scale."""
    rng = np.random.default_rng(3)
    n, radius = 256, 0.5
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.05) ** (1 / 3))
    pos0 = rng.uniform(0, box, (n, 3))
    init_fn, step_fn = make_balanced_lcp_step(
        _mesh(), "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        diffusion_coeff=0.1, dtype=jnp.float64)
    s = init_fn(jax.random.PRNGKey(1), pos=pos0)
    s = step_fn(s, 30)
    jax.block_until_ready(s["pos"])
    assert not bool(np.any(np.asarray(jax.device_get(s["overflow"]))))
    mp, seen = flat_pos(s, n)
    assert np.all(seen == 1)
    assert np.isfinite(mp).all()
    # steady-state overlap bounded by the Brownian step scale
    assert brute_max_overlap(mp, box, radius) < np.sqrt(2 * 0.1 * 1e-3) * 4
