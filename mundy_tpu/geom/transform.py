"""Rigid transforms of points/primitives.

Replaces the reference's `transform.hpp:1-420`: on TPU a rigid transform is
(quaternion, translation) applied to the arrays of a primitive pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mundy_tpu.math.quaternion import quat_inverse_rotate, quat_rotate


def transform_points(q: Array, t: Array, p: Array) -> Array:
    """x' = R(q) x + t."""
    return quat_rotate(q, p) + t


def inverse_transform_points(q: Array, t: Array, p: Array) -> Array:
    """x' = R(q)^T (x - t)."""
    return quat_inverse_rotate(q, p - t)
