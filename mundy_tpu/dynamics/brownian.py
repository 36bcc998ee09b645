"""Brownian velocity from counter-based RNG.

ref: ComputeBrownianVelocity SpheresKernel
(`compute_brownian_velocity/kernels/SpheresKernel.cpp:119-123`):
    v += sqrt(2 D / dt) * randn()   per component, Philox(node_gid, counter).
JAX's threefry is the same counter-based construction: fold the step counter
into the key, draw per-particle normals — reproducible and independent of
iteration order or sharding layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def brownian_velocity(key: Array, step: Array, n: int, diffusion: Array, dt,
                      dtype=jnp.float32) -> Array:
    """(N, 3) Brownian velocities: sqrt(2 D / dt) * N(0,1).

    `diffusion` is scalar or (N,); `step` is folded into the key so each
    timestep draws fresh, reproducible noise (the Philox counter).
    """
    k = jax.random.fold_in(key, step)
    z = jax.random.normal(k, (n, 3), dtype=dtype)
    scale = jnp.sqrt(2.0 * jnp.broadcast_to(diffusion, (n,)) / dt).astype(dtype)
    return scale[:, None] * z


def brownian_velocity_keyed(key: Array, step: Array, gid: Array,
                            diffusion: Array, dt, dtype=jnp.float32) -> Array:
    """(..., 3) Brownian velocities keyed by per-entity global id.

    Same counter-based construction as brownian_velocity, but the stream is
    indexed by (key, step, gid) directly — one threefry block per entity —
    instead of positions in a length-N array. Engines that hold particles in
    permuted layouts (row grid, z-slab shards) get identical noise without
    the gid gather (~4.3 ns/row on v5e, i.e. ~4 ms/step at 1M bodies), and a
    shard only ever generates noise for the entities it owns."""
    kstep = jax.random.fold_in(key, step)
    flat_gid = gid.reshape(-1)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(kstep, flat_gid)
    z = jax.vmap(lambda k: jax.random.normal(k, (3,), dtype=dtype))(keys)
    z = z.reshape(gid.shape + (3,))
    scale = jnp.sqrt(2.0 * jnp.broadcast_to(diffusion, gid.shape) / dt).astype(dtype)
    return scale[..., None] * z


def brownian_angular_velocity(key: Array, step: Array, n: int, rot_diffusion: Array,
                              dt, dtype=jnp.float32) -> Array:
    """(N, 3) rotational Brownian angular velocities (distinct stream)."""
    k = jax.random.fold_in(jax.random.fold_in(key, step), 0x5EED)
    z = jax.random.normal(k, (n, 3), dtype=dtype)
    scale = jnp.sqrt(2.0 * jnp.broadcast_to(rot_diffusion, (n,)) / dt).astype(dtype)
    return scale[:, None] * z
