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


def _uniform_range(key: Array, n: int, rng, dtype) -> Array:
    lo, hi = (rng if isinstance(rng, (tuple, list)) else (rng, rng))
    return jax.random.uniform(key, (n,), dtype=dtype,
                              minval=float(lo), maxval=float(hi))


def random_spheres(key: Array, n: int, low, high, radius=0.5,
                   dtype=jnp.float32):
    """N random spheres: centers in the box, radii in `radius` (scalar or
    (lo, hi) range). ref: randomize.hpp sphere overload."""
    from mundy_tpu.geom.primitives import Sphere

    kp, kr = jax.random.split(key)
    return Sphere(center=random_points_in_box(kp, n, low, high, dtype),
                  radius=_uniform_range(kr, n, radius, dtype))


def random_spherocylinders(key: Array, n: int, low, high, radius=0.5,
                           length=2.0, dtype=jnp.float32):
    """N random capsules: centers in the box, Haar orientations, radii and
    lengths in their ranges. ref: randomize.hpp spherocylinder overload."""
    from mundy_tpu.geom.primitives import Spherocylinder

    kp, kq, kr, kl = jax.random.split(key, 4)
    return Spherocylinder(
        center=random_points_in_box(kp, n, low, high, dtype),
        orientation=random_unit_quaternions(kq, n, dtype),
        radius=_uniform_range(kr, n, radius, dtype),
        length=_uniform_range(kl, n, length, dtype))


def random_segments(key: Array, n: int, low, high, length=1.0,
                    dtype=jnp.float32):
    """N random line segments: start in the box, direction Haar-random,
    length in its range. ref: randomize.hpp segment overload."""
    from mundy_tpu.geom.primitives import LineSegment
    from mundy_tpu.math.quaternion import quat_rotate

    kp, kq, kl = jax.random.split(key, 3)
    start = random_points_in_box(kp, n, low, high, dtype)
    zhat = jnp.zeros((3,), dtype).at[2].set(1.0)
    d = quat_rotate(random_unit_quaternions(kq, n, dtype), zhat)
    ln = _uniform_range(kl, n, length, dtype)
    return LineSegment(start=start, end=start + ln[:, None] * d)


def random_ellipsoids(key: Array, n: int, low, high, radii=(1.0, 0.7, 0.4),
                      dtype=jnp.float32):
    """N random ellipsoids: centers in the box, Haar orientations, each
    semi-axis in its range ((lo, hi) per axis or fixed triple).
    ref: randomize.hpp ellipsoid overload."""
    from mundy_tpu.geom.primitives import Ellipsoid

    kp, kq, kr = jax.random.split(key, 3)
    ks = jax.random.split(kr, 3)
    semis = jnp.stack([_uniform_range(ks[i], n, radii[i], dtype)
                       for i in range(3)], axis=-1)
    return Ellipsoid(center=random_points_in_box(kp, n, low, high, dtype),
                     orientation=random_unit_quaternions(kq, n, dtype),
                     radii=semis)


def random_rings(key: Array, n: int, low, high, major_radius=1.0,
                 minor_radius=0.2, dtype=jnp.float32):
    """N random tori. ref: randomize.hpp ring overload."""
    from mundy_tpu.geom.primitives import Ring

    kp, kq, km, kt = jax.random.split(key, 4)
    return Ring(center=random_points_in_box(kp, n, low, high, dtype),
                orientation=random_unit_quaternions(kq, n, dtype),
                major_radius=_uniform_range(km, n, major_radius, dtype),
                minor_radius=_uniform_range(kt, n, minor_radius, dtype))
