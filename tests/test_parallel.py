"""Multi-device execution on the 8-device virtual CPU mesh.

Mirrors the reference strategy of emulating multi-node with multiple MPI
ranks on one host (SURVEY.md §4): the slab-decomposed step must reproduce
the physics of a single-device reference run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.parallel import make_sharded_spheres_step
from mundy_tpu.parallel.sharded_step import make_slab_spheres_step

pytestmark = pytest.mark.slow


@pytest.fixture
def mesh(devices8):
    return Mesh(devices8, ("shard",))


def test_gather_version_runs(mesh):
    step, init = make_sharded_spheres_step(
        mesh, "shard", n_total=512, box_size=16.0, radius=0.5,
        diffusion=0.05, dt=1e-4, max_neighbors=16, cell_capacity=32)
    pos = init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    p, ov = step(pos, key, jnp.asarray(0, jnp.int32))
    assert p.shape == (512, 3)
    assert np.isfinite(np.asarray(p)).all()
    assert float(ov) >= 0


def test_slab_version_physics(mesh):
    """Slab-decomposed run: all particles preserved, positions stay in the
    box, overlaps relax over steps, no capacity overflow."""
    n = 800
    step, init = make_slab_spheres_step(
        mesh, "shard", n_total=n, box_size=20.0, radius=0.5,
        youngs=200.0, diffusion=0.05, dt=2e-4, max_neighbors=32,
        cell_capacity=32)
    pos, active, gid, ovf = init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    assert int(jnp.sum(active)) == n

    overlaps = []
    for s in range(200):
        pos, active, gid, ovf, mo = step(pos, active, gid, ovf,
                                         key, jnp.asarray(s, jnp.int32))
        overlaps.append(float(mo))
    assert not bool(ovf)
    # conservation: every particle still owned exactly once
    assert int(jnp.sum(active)) == n
    gids = np.sort(np.asarray(gid)[np.asarray(active)])
    np.testing.assert_array_equal(gids, np.arange(n))
    # physics: worst overlap shrinks
    assert overlaps[-1] < 0.7 * overlaps[0]
    p = np.asarray(pos)[np.asarray(active)]
    assert (p >= 0).all() and (p <= 20.0).all()


def test_slab_matches_single_device(mesh):
    """Same initial condition stepped once (no Brownian): the slab-sharded
    forces must match a brute-force single-device computation."""
    n = 400
    box = 16.0
    radius = 0.5
    step, init = make_slab_spheres_step(
        mesh, "shard", n_total=n, box_size=box, radius=radius,
        youngs=200.0, diffusion=0.0, dt=1e-3, max_neighbors=32,
        cell_capacity=32)
    pos, active, gid, ovf = init(jax.random.PRNGKey(0))
    pos0_by_gid = np.zeros((n, 3))
    pos0_by_gid[np.asarray(gid)[np.asarray(active)]] = np.asarray(pos)[np.asarray(active)]

    key = jax.random.PRNGKey(1)
    pos1, active1, gid1, ovf1, _ = step(pos, active, gid, ovf, key,
                                        jnp.asarray(0, jnp.int32))
    out_by_gid = np.zeros((n, 3))
    out_by_gid[np.asarray(gid1)[np.asarray(active1)]] = np.asarray(pos1)[np.asarray(active1)]

    # single-device reference (brute-force O(N^2), float64)
    p = pos0_by_gid
    d = p[:, None, :] - p[None, :, :]
    d -= box * np.round(d / box)
    dist = np.linalg.norm(d, axis=-1)
    np.fill_diagonal(dist, np.inf)
    delta = np.maximum(2 * radius - dist, 0.0)
    e_eff = 200.0 / (2 * (1 - 0.09))
    mag = (4 / 3) * e_eff * np.sqrt(radius / 2) * delta**1.5
    nhat = d / dist[..., None]
    force = (mag[..., None] * nhat).sum(axis=1)  # force on i away from j
    vel = force / (6 * np.pi * 1.0 * radius)
    expect = np.mod(p + 1e-3 * vel, box)

    np.testing.assert_allclose(out_by_gid, expect, atol=5e-5)


def test_migration_across_shards(mesh):
    """Particles drifting across slab boundaries change owners without loss."""
    n = 64
    box = 16.0
    step, init = make_slab_spheres_step(
        mesh, "shard", n_total=n, box_size=box, radius=0.2,
        youngs=0.0, diffusion=0.5, dt=5e-3, max_neighbors=8,
        cell_capacity=64)
    pos, active, gid, ovf = init(jax.random.PRNGKey(2))
    owner0 = np.repeat(np.arange(8), pos.shape[0] // 8)[np.asarray(active)]
    key = jax.random.PRNGKey(3)
    for s in range(50):
        pos, active, gid, ovf, _ = step(pos, active, gid, ovf, key,
                                        jnp.asarray(s, jnp.int32))
    assert not bool(ovf)
    assert int(jnp.sum(active)) == n
    gids = np.sort(np.asarray(gid)[np.asarray(active)])
    np.testing.assert_array_equal(gids, np.arange(n))
    # with strong diffusion, at least one particle changed shard
    slot_owner = np.repeat(np.arange(8), pos.shape[0] // 8)
    owner_of_gid = np.zeros(n, int)
    owner_of_gid[np.asarray(gid)[np.asarray(active)]] = slot_owner[np.asarray(active)]
    # compare against initial owners
    init_owner = np.zeros(n, int)
    pos0, active0, gid0, _ = init(jax.random.PRNGKey(2))
    init_owner[np.asarray(gid0)[np.asarray(active0)]] = slot_owner[np.asarray(active0)]
    assert (owner_of_gid != init_owner).any()


def test_ring_rpy_matches_dense(mesh):
    """Sharded ring-RPY product must equal the single-device dense apply."""
    from mundy_tpu.parallel.ring_rpy import make_ring_rpy_apply
    from mundy_tpu.mobility import rpy_apply_dense
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = 256
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0, 10, (n, 3)), jnp.float64)
    f = jnp.asarray(rng.normal(size=(n, 3)), jnp.float64)
    expect = rpy_apply_dense(pos, f, 0.4, 1.3, chunk=64)

    apply = make_ring_rpy_apply(mesh, "shard", radius=0.4, viscosity=1.3,
                                chunk=32)
    sh = NamedSharding(mesh, P("shard"))
    u = apply(jax.device_put(pos, sh), jax.device_put(f, sh))
    np.testing.assert_allclose(np.asarray(u), np.asarray(expect), rtol=1e-10)


def test_hilbert_shard_permutation_locality():
    from mundy_tpu.parallel.ring_rpy import hilbert_shard_permutation

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, (4096, 3))
    perm = hilbert_shard_permutation(pos, [0, 0, 0], [10, 10, 10])
    assert sorted(perm.tolist()) == list(range(4096))
    # spatial locality: the bounding box of each of 8 contiguous chunks is
    # much smaller than the domain
    sorted_pos = pos[perm]
    vols = []
    for c in np.array_split(sorted_pos, 8):
        ext = c.max(axis=0) - c.min(axis=0)
        vols.append(np.prod(ext))
    assert np.mean(vols) < 0.35 * 1000.0  # vs full box volume 1000


def test_slab_rows_matches_single_chip(mesh):
    """Sharded row engine must reproduce the single-chip row engine exactly
    (same gid-keyed Brownian streams, same rebuild logic)."""
    from mundy_tpu.driver.apps.spheres import SpheresConfig
    from mundy_tpu.driver.apps.spheres_rows import RowSpheresSim
    from mundy_tpu.parallel.slab_rows import make_slab_rows_spheres_step
    from mundy_tpu.neighbor.rows import rows_to_flat, RowState

    n = 600
    box = 16.0
    cfg = SpheresConfig(num_spheres=n, box_size=box, radius=0.5,
                        youngs_modulus=200.0, diffusion_coeff=0.05,
                        dt=2e-4, skin=0.4, dtype="float32", log_every=1000)
    # single chip reference
    sim = RowSpheresSim(cfg)
    init_fn, step_fn, grid = make_slab_rows_spheres_step(
        mesh, "shard", n_total=n, box_size=box, radius=0.5, youngs=200.0,
        poisson=0.3, diffusion=0.05, dt=2e-4, skin=0.4)
    # align grids: the slab engine rounds nz to the mesh size; rebuild the
    # single-chip sim on the same grid for exact comparison
    sim.grid = grid
    key = jax.random.PRNGKey(7)
    s_ref = sim.init(key)
    state = init_fn(key)
    np.testing.assert_array_equal(np.asarray(state["gid"]),
                                  np.asarray(s_ref.rows.gid))

    s_ref = sim.run_block(s_ref, 30)
    state = step_fn(state, 30)
    assert not bool(state["overflow"]) and not bool(s_ref.overflow)

    flat_ref = np.asarray(sim.positions(s_ref))
    # flatten sharded rows by gid
    pos = np.asarray(state["pos"]).reshape(-1, 3)
    gid = np.asarray(state["gid"]).reshape(-1)
    val = np.asarray(state["valid"]).reshape(-1)
    flat = np.zeros((n, 3), np.float32)
    flat[gid[val]] = pos[val]
    np.testing.assert_allclose(flat, flat_ref, atol=2e-4)


def test_slab_rows_local_rebuild_matches_global(mesh):
    """The slab-local rebuild (boundary-plane migrant exchange + local
    resort) must produce the exact rows the global resort does, and hence
    identical trajectories to the single-chip engine."""
    from mundy_tpu.driver.apps.spheres import SpheresConfig
    from mundy_tpu.driver.apps.spheres_rows import RowSpheresSim
    from mundy_tpu.parallel.slab_rows import make_slab_rows_spheres_step

    n = 1500
    box = 24.0  # nz = 17 -> 16 over 8 shards: nzl = 2, local rebuild legal
    common = dict(n_total=n, box_size=box, radius=0.5, youngs=200.0,
                  poisson=0.3, diffusion=0.05, dt=2e-4, skin=0.4)
    init_l, step_l, grid = make_slab_rows_spheres_step(
        mesh, "shard", rebuild_mode="local", **common)
    init_g, step_g, _ = make_slab_rows_spheres_step(
        mesh, "shard", rebuild_mode="global", **common)

    key = jax.random.PRNGKey(11)
    sl = init_l(key)
    sg = init_g(key)
    # long enough to cross several skin-triggered rebuilds
    sl = step_l(sl, 60)
    sg = step_g(sg, 60)
    assert not bool(sl["overflow"]) and not bool(sg["overflow"])

    def flatten(state):
        pos = np.asarray(state["pos"]).reshape(-1, 3)
        gid = np.asarray(state["gid"]).reshape(-1)
        val = np.asarray(state["valid"]).reshape(-1)
        flat = np.zeros((n, 3), np.float32)
        flat[gid[val]] = pos[val]
        assert val.sum() == n
        return flat

    np.testing.assert_array_equal(flatten(sl), flatten(sg))

    # and both match the single-chip row engine on the same grid
    cfg = SpheresConfig(num_spheres=n, box_size=box, radius=0.5,
                        youngs_modulus=200.0, diffusion_coeff=0.05,
                        dt=2e-4, skin=0.4, dtype="float32", log_every=1000)
    sim = RowSpheresSim(cfg)
    sim.grid = grid
    s_ref = sim.run_block(sim.init(key), 60)
    assert not bool(s_ref.overflow)
    np.testing.assert_allclose(flatten(sl), np.asarray(sim.positions(s_ref)),
                               atol=2e-4)
