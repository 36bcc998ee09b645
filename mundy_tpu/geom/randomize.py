"""Random configuration generation.

Replaces the reference's `randomize.hpp:1-306` (OpenRAND Philox-driven
per-primitive randomization): JAX's counter-based threefry PRNG plays the
role of Philox — same reproducible, order-independent semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from mundy_tpu.math.quaternion import quat_normalize


def random_points_in_box(key: Array, n: int, low, high, dtype=jnp.float32) -> Array:
    """Uniform points in an axis-aligned box (ref randomize positions,
    StkNgpLCP.cpp randomize_positions)."""
    low = jnp.asarray(low, dtype)
    high = jnp.asarray(high, dtype)
    u = jax.random.uniform(key, (n, 3), dtype=dtype)
    return low + u * (high - low)


def random_unit_quaternions(key: Array, n: int, dtype=jnp.float32) -> Array:
    """Uniform (Haar) random rotations via normalized 4-D Gaussians."""
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return quat_normalize(q)
