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


def brownian_angular_velocity(key: Array, step: Array, n: int, rot_diffusion: Array,
                              dt, dtype=jnp.float32) -> Array:
    """(N, 3) rotational Brownian angular velocities (distinct stream)."""
    k = jax.random.fold_in(jax.random.fold_in(key, step), 0x5EED)
    z = jax.random.normal(k, (n, 3), dtype=dtype)
    scale = jnp.sqrt(2.0 * jnp.broadcast_to(rot_diffusion, (n,)) / dt).astype(dtype)
    return scale[:, None] * z
