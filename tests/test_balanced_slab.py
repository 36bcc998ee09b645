"""Runtime load rebalancing (density-balanced z-slabs) on 8 virtual devices.

The stk::balance/RCB role (`HP1...neigh_linker.cpp:820,1358`): a clustered
config that overflows uniform z-slabs must complete under the balanced
decomposition with valid trajectories (no lost/duplicated bodies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mundy_tpu.parallel.balanced_slab import (balanced_bounds,
                                              make_balanced_settling_step,
                                              reference_settling_step,
                                              uniform_bounds)

pytestmark = pytest.mark.slow

BOX = (10.0, 10.0, 24.0)
N = 1024


def clustered_positions(rng, n=N, frac=0.5):
    """Random cloud concentrated in the bottom `frac` of z — the settled-bed
    density profile that breaks uniform slabs."""
    lx, ly, lz = BOX
    pos = np.empty((n, 3))
    pos[:, 0] = rng.uniform(0.6, lx - 0.6, n)
    pos[:, 1] = rng.uniform(0.6, ly - 0.6, n)
    pos[:, 2] = rng.uniform(0.6, frac * lz, n)
    return pos


def test_balanced_bounds_equalize_counts(rng):
    z = jnp.asarray(np.concatenate([rng.uniform(0, 3, 700),
                                    rng.uniform(3, 24, 100)]))
    valid = jnp.ones((800,), bool)
    b = np.asarray(balanced_bounds(z, valid, 8, 0.0, 24.0))
    assert b[0] == 0.0 and b[-1] == 24.0
    assert np.all(np.diff(b) > 0)
    counts = np.histogram(np.asarray(z), bins=b)[0]
    # each slab within ~25% of N/d (bin-resolution limited)
    assert counts.max() <= 1.3 * 100 and counts.min() >= 0.7 * 100, counts


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("shard",))


def test_uniform_slabs_overflow_clustered_config(rng):
    mesh = _mesh()
    pos = clustered_positions(rng)
    init_fn, step_fn, _gather = make_balanced_settling_step(
        mesh, "shard", N, BOX, radius=0.3, skin=0.24, dtype=jnp.float64,
        balance="uniform")
    state = init_fn(pos)
    # bottom ~3 uniform slabs hold nearly everything: own capacity
    # (1.5 * N/8) cannot hold N/3 — the overflow flag must fire at init
    assert bool(np.any(np.asarray(jax.device_get(state["overflow"]))))


def test_balanced_slabs_match_single_device(rng):
    mesh = _mesh()
    pos0 = clustered_positions(rng)
    init_fn, step_fn, gather = make_balanced_settling_step(
        mesh, "shard", N, BOX, radius=0.3, skin=0.24, dtype=jnp.float64,
        balance="balanced")
    state = init_fn(pos0)
    assert not bool(np.any(np.asarray(jax.device_get(state["overflow"]))))

    ref_step = reference_settling_step(N, BOX, radius=0.3, skin=0.24,
                                       dtype=jnp.float64)
    ref = jnp.asarray(pos0, jnp.float64)

    total_steps = 120
    block = 40
    for _ in range(total_steps // block):
        state = step_fn(state, block)
    for _ in range(total_steps):
        ref, _ovf = ref_step(ref)

    assert not bool(np.any(np.asarray(jax.device_get(state["overflow"]))))
    got, seen = gather(state)
    # no lost or duplicated bodies across the rebalances
    assert np.all(seen == 1), (seen.min(), seen.max())
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=1e-8)


def test_rebalance_follows_the_density(rng):
    """After settling steps the boundaries move with the bodies: the state
    keeps every shard's own-count within capacity while a uniform split
    would be over capacity in the bottom slab."""
    mesh = _mesh()
    pos0 = clustered_positions(rng, frac=0.5)
    init_fn, step_fn, gather = make_balanced_settling_step(
        mesh, "shard", N, BOX, radius=0.3, skin=0.24, dtype=jnp.float64,
        balance="balanced")
    state = init_fn(pos0)
    state = step_fn(state, 150)  # settles further; several rebuilds
    assert not bool(np.any(np.asarray(jax.device_get(state["overflow"]))))
    counts = np.asarray(jax.device_get(state["valid"])).reshape(8, -1).sum(1)
    n_cap = state["pos"].shape[-2]
    assert counts.max() <= n_cap
    # the settled configuration is bottom-heavy: a uniform split would
    # put > capacity bodies in the bottom slab
    pos, _ = gather(state)
    ub = np.asarray(uniform_bounds(8, 0.0, BOX[2], jnp.float64))
    ucounts = np.histogram(pos[:, 2], bins=ub)[0]
    assert ucounts.max() > n_cap
