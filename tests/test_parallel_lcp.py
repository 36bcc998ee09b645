"""Sharded LCP pipeline (parallel/slab_lcp.py): physics equivalence with the
single-chip LCPSpheresSim on the 8-virtual-device CPU mesh — the multi-rank
equivalence tier of the reference's test strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
from mundy_tpu.parallel.slab_lcp import make_slab_lcp_spheres_step

pytestmark = pytest.mark.slow


def flat_pos(state, n):
    """Row-layout shard state -> (n, 3) positions ordered by gid."""
    p = np.asarray(state["pos"]).reshape(-1, 3)
    g = np.asarray(state["gid"]).reshape(-1)
    v = np.asarray(state["valid"]).reshape(-1)
    out = np.zeros((n, 3))
    out[g[v]] = p[v]
    return out


def brute_max_overlap(pos, box, radius):
    n = pos.shape[0]
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1)) + np.eye(n) * 1e9
    return float(2 * radius - dist.min())


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs[:8], ("shard",))


def test_slab_lcp_matches_single_chip(mesh8):
    """Same initial overlap problem, same solver settings: the sharded
    pipeline must reproduce the single-chip trajectory to solver tolerance
    (both solves converge; LCP solutions are generically unique)."""
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

    init_fn, step_fn, _grid = make_slab_lcp_spheres_step(
        mesh8, "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        max_allowable_overlap=tol, pair_capacity_per_body=8,
        dtype=jnp.float64)
    m_state = init_fn(jax.random.PRNGKey(0), pos=pos0)

    steps = 30
    s_state = single.run_block(s_state, steps)
    m_state = step_fn(m_state, steps)
    jax.block_until_ready(m_state["pos"])

    assert not bool(s_state.overflow)
    assert not bool(m_state["overflow"])
    sp = np.asarray(s_state.pos)
    mp = flat_pos(m_state, n)
    # same periodic image
    diff = sp - mp
    diff -= box * np.round(diff / box)
    assert np.abs(diff).max() < 1e-5, np.abs(diff).max()
    # both resolved the initial overlaps
    assert brute_max_overlap(mp, box, radius) < 1e-6


def test_slab_lcp_conserves_and_resolves(mesh8):
    """Brownian-driven run: particle conservation through rebuilds, sticky
    overflow stays clear, overlap stays at solver scale."""
    n, radius = 1000, 0.5
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.05) ** (1 / 3))
    init_fn, step_fn, _grid = make_slab_lcp_spheres_step(
        mesh8, "shard", n_total=n, box_size=box, radius=radius, dt=1e-3,
        diffusion=0.1, pair_capacity_per_body=8, dtype=jnp.float64)
    state = init_fn(jax.random.PRNGKey(1))
    state = step_fn(state, 50)
    jax.block_until_ready(state["pos"])
    assert int(jnp.sum(state["valid"])) == n
    assert not bool(state["overflow"])
    pos = flat_pos(state, n)
    assert np.isfinite(pos).all()
    # Brownian drift enters the LCP's constant term (q = sep0 + dt D^T u_b)
    # so end-of-step penetration holds at solver tolerance, noise included
    assert brute_max_overlap(pos, box, radius) < 1e-4


def test_lcp_ring_rpy_hydro(mesh8):
    """hydro: rpy_ring — the dense RPY mobility ring-rotated over the mesh
    inside the BBPGD solve, with Hilbert setup balancing. Must resolve the
    initial overlaps like the local-drag path and match a single-device
    dense-RPY solve step."""
    from mundy_tpu.constraints import collision_setup_spheres, resolve_collisions
    from mundy_tpu.mobility import rpy_apply_dense

    n, radius = 512, 0.5
    box = float((n * (4 / 3) * np.pi * radius**3 / 0.05) ** (1 / 3))
    cfg = LCPSpheresConfig(num_spheres=n, box_size=box, radius=radius,
                           dt=1e-3, hydro="rpy_ring", dtype="float64",
                           num_steps=10, log_every=100)
    sim = LCPSpheresSim(cfg, mesh=mesh8)
    state = sim.init()
    # Hilbert ordering: contiguous blocks are spatially local — mean
    # intra-block pair distance far below the random-order baseline
    pos = np.asarray(state.pos)
    blk = pos[: n // 8]
    spread = np.linalg.norm(blk - blk.mean(0), axis=1).mean()
    rng = np.random.default_rng(0)
    rand = pos[rng.permutation(n)[: n // 8]]
    rand_spread = np.linalg.norm(rand - rand.mean(0), axis=1).mean()
    assert spread < 0.7 * rand_spread

    over0 = sim.max_overlap(state)
    assert over0 > 0.1
    state = sim.run_block(state, 10)
    jax.block_until_ready(state.pos)
    assert not bool(state.overflow)
    assert sim.max_overlap(state) < 1e-4

    # one-step cross-check: the ring mobility inside resolve_collisions
    # gives the same gamma as the single-device dense RPY operator
    from mundy_tpu.ops.segments import SegmentWindows
    windows = SegmentWindows(starts=state.seg_starts,
                             block_bodies=sim.seg_block,
                             window=sim.seg_window,
                             overflow=jnp.asarray(False))
    setup = collision_setup_spheres(state.pos, jnp.asarray(radius),
                                    state.pairs, metric=sim.metric,
                                    windows=windows)
    g_ring, _v, _r = resolve_collisions(
        setup, lambda f: sim.ring_apply(state.pos, f), n, cfg.dt,
        max_allowable_overlap=1e-8)
    g_dense, _v, _r = resolve_collisions(
        setup, lambda f: rpy_apply_dense(state.pos, f, radius, 1.0,
                                         overlap_correction=True),
        n, cfg.dt, max_allowable_overlap=1e-8)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                               atol=1e-8)
