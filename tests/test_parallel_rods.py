"""Slab-decomposed rods engine vs the single-chip row engine.

Reference strategy (SURVEY.md §4): multi-rank behavior emulated with several
ranks on one host; here an 8-device virtual CPU mesh. The sharded
spherocylinder step (parallel/slab_segments.py) must reproduce the
single-chip RowRodsSim trajectory — same gid-keyed Brownian streams, same
rebuild cadence, same clamped segment-segment narrow phase.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.driver.apps.rods import RodsConfig
from mundy_tpu.driver.apps.rods_rows import RowRodsSim, RowRodsState
from mundy_tpu.neighbor.rows import build_rows
from mundy_tpu.parallel.slab_segments import make_slab_rods_step

pytestmark = pytest.mark.slow


@pytest.fixture
def mesh(devices8):
    return Mesh(devices8, ("shard",))


def _flatten(state, n):
    pos = np.asarray(state["pos"]).reshape(-1, 3)
    quat = np.asarray(state["quat"]).reshape(-1, 4)
    gid = np.asarray(state["gid"]).reshape(-1)
    val = np.asarray(state["valid"]).reshape(-1)
    fp = np.zeros((n, 3), pos.dtype)
    fq = np.zeros((n, 4), quat.dtype)
    fp[gid[val]] = pos[val]
    fq[gid[val]] = quat[val]
    return fp, fq


def test_slab_rods_matches_single_chip(mesh):
    """30 steps (including at least one skin rebuild) of the sharded rods
    engine reproduce RowRodsSim exactly (f64: roundoff-level agreement)."""
    n = 500
    box = 24.0
    cfg = RodsConfig(num_rods=n, box_size=box, length=2.0, radius=0.25,
                     youngs_modulus=500.0, diffusion_coeff=0.1,
                     rot_diffusion_coeff=0.1, dt=2e-4, skin=0.4,
                     dtype="float64")
    init_fn, step_fn, grid = make_slab_rods_step(
        mesh, "shard", n_total=n, box_size=box, length=2.0, radius=0.25,
        youngs=500.0, diffusion=0.1, rot_diffusion=0.1, dt=2e-4, skin=0.4,
        dtype=jnp.float64)

    key = jax.random.PRNGKey(11)
    state = init_fn(key)

    # single-chip reference on the SAME grid (bypass init's right-sizing so
    # both engines build identical row layouts)
    sim = RowRodsSim(cfg)
    sim.grid = grid
    kp, kq, ks = jax.random.split(key, 3)
    from mundy_tpu.geom.randomize import random_unit_quaternions
    pos0 = jax.random.uniform(kp, (n, 3), dtype=jnp.float64, maxval=box)
    quat0 = random_unit_quaternions(kq, n, dtype=jnp.float64)
    rows = build_rows(pos0, jnp.arange(n, dtype=jnp.int32), grid)
    s_ref = RowRodsState(rows=rows, quat=sim._payload_to_rows(quat0, rows),
                         key=ks, step=jnp.asarray(0, jnp.int32),
                         rebuild_count=jnp.asarray(1, jnp.int32),
                         overflow=rows.overflow)
    np.testing.assert_array_equal(np.asarray(state["gid"]),
                                  np.asarray(rows.gid))

    s_ref = sim.run_block(s_ref, 30)
    state = step_fn(state, 30)
    assert not bool(state["overflow"]) and not bool(s_ref.overflow)

    flat_p, flat_q = _flatten(state, n)
    ref_p = np.asarray(sim.positions(s_ref))
    ref_q = np.asarray(sim.quaternions(s_ref))
    np.testing.assert_allclose(flat_p, ref_p, atol=1e-9)
    np.testing.assert_allclose(flat_q, ref_q, atol=1e-9)


def test_slab_rods_conservation_and_relaxation(mesh):
    """Dense overlapping start: every rod stays owned exactly once across
    rebuilds/migration; contact energy relaxes (max overlap shrinks)."""
    n = 1200
    box = 22.0
    init_fn, step_fn, grid = make_slab_rods_step(
        mesh, "shard", n_total=n, box_size=box, length=1.5, radius=0.25,
        youngs=200.0, diffusion=0.0, rot_diffusion=0.0, dt=2e-4, skin=0.4,
        dtype=jnp.float64)
    state = init_fn(jax.random.PRNGKey(3))

    def min_sep(state):
        from mundy_tpu.geom.distance import segment_segment_closest
        from mundy_tpu.math.quaternion import quat_rotate
        fp, fq = _flatten(state, n)
        axis = np.asarray(quat_rotate(
            jnp.asarray(fq), jnp.zeros((3,), jnp.float64).at[2].set(1.0)))
        half = 0.75
        best = 1e9
        for i in range(n):
            dvec = fp - fp[i]
            dvec -= box * np.round(dvec / box)
            cand = np.where((np.abs(dvec) < 3.0).all(axis=1))[0]
            cand = cand[cand != i]
            if len(cand) == 0:
                continue
            pj = fp[i] + dvec[cand]
            a0 = fp[i] - half * axis[i]
            a1 = fp[i] + half * axis[i]
            b0 = pj - half * axis[cand]
            b1 = pj + half * axis[cand]
            _s, _t, c1, c2 = segment_segment_closest(
                jnp.broadcast_to(jnp.asarray(a0), b0.shape),
                jnp.broadcast_to(jnp.asarray(a1), b0.shape),
                jnp.asarray(b0), jnp.asarray(b1))
            dist = np.asarray(jnp.linalg.norm(c2 - c1, axis=-1))
            best = min(best, float(dist.min()) - 0.5)
        return best

    s0 = min_sep(state)
    state = step_fn(state, 150)
    s1 = min_sep(state)

    gid = np.asarray(state["gid"]).reshape(-1)
    val = np.asarray(state["valid"]).reshape(-1)
    np.testing.assert_array_equal(np.sort(gid[val]), np.arange(n))
    assert not bool(state["overflow"])
    assert s1 > s0, f"overlaps did not relax: {s0} -> {s1}"


def test_slab_rods_local_rebuild_matches_global(mesh):
    """Quaternions migrate with their rods through the slab-local resort:
    local and global rebuild modes produce identical states."""
    n = 2500
    box = 48.0  # rod cutoff 2.9: nz = 16 over 8 shards -> nzl = 2
    common = dict(n_total=n, box_size=box, length=2.0, radius=0.25,
                  youngs=300.0, diffusion=0.08, rot_diffusion=0.08,
                  dt=2e-4, skin=0.4, dtype=jnp.float64)
    init_l, step_l, _ = make_slab_rods_step(
        mesh, "shard", rebuild_mode="local", **common)
    init_g, step_g, _ = make_slab_rods_step(
        mesh, "shard", rebuild_mode="global", **common)
    key = jax.random.PRNGKey(5)
    sl = step_l(init_l(key), 40)
    sg = step_g(init_g(key), 40)
    assert not bool(sl["overflow"]) and not bool(sg["overflow"])
    lp, lq = _flatten(sl, n)
    gp, gq = _flatten(sg, n)
    assert np.asarray(sl["valid"]).sum() == n
    np.testing.assert_array_equal(lp, gp)
    np.testing.assert_array_equal(lq, gq)
