"""Batched quaternion algebra, convention w-x-y-z (scalar first).

Replaces the reference's `Quaternion<T, Accessor, Ownership>`
(`mundy/math/src/mundy_math/Quaternion.hpp`). Conventions are pinned here
because the reference itself flags ambiguity ("Our quaternion is backwards",
`REDESIGN.md:10`): we use Hamilton products, scalar-first storage, and
`quat_rotate(q, v) = q v q*` as the active rotation of `v` by `q`.

All functions broadcast over leading batch axes; quaternions are `(..., 4)`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mundy_tpu.math.linalg import cross, dot, norm


def quat_identity(shape=(), dtype=jnp.float32) -> Array:
    """Identity quaternion(s) of shape (*shape, 4)."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 ⊗ q2."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: Array, eps: float = 1e-30) -> Array:
    n = jnp.maximum(norm(q), eps)
    return q / n[..., None]


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v by quaternion(s) q (active rotation, q v q*).

    Uses the expanded 15-mul form rather than two quaternion products.
    """
    w = q[..., 0]
    u = q[..., 1:4]
    uv = cross(u, v)
    uuv = cross(u, uv)
    return v + 2.0 * (w[..., None] * uv + uuv)


def quat_inverse_rotate(q: Array, v: Array) -> Array:
    """Rotate v by the inverse of unit quaternion q."""
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis: Array, angle: Array) -> Array:
    """Unit quaternion for rotation of `angle` radians about unit `axis`."""
    half = 0.5 * jnp.asarray(angle)
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], s[..., None] * axis], axis=-1
    )


def quat_to_matrix(q: Array) -> Array:
    """Unit quaternion -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m: Array) -> Array:
    """Rotation matrix -> unit quaternion, branch-free (Shepperd's method
    implemented with where-selects so it vmaps/jits cleanly)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    pivot = jnp.argmax(qw, axis=-1)
    s = jnp.sqrt(jnp.maximum(jnp.take_along_axis(qw, pivot[..., None], axis=-1)[..., 0], 1e-30)) * 2.0

    case0 = jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)
    case1 = jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)
    case2 = jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)
    case3 = jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

    cases = jnp.stack([case0, case1, case2, case3], axis=-2)
    q = jnp.take_along_axis(cases, pivot[..., None, None], axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_slerp(q0: Array, q1: Array, t: Array) -> Array:
    """Spherical linear interpolation between unit quaternions."""
    d = dot(q0, q1)
    q1 = jnp.where(d[..., None] < 0.0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)
    # fall back to lerp near theta=0
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)


def quat_from_omega_dt(omega: Array, dt) -> Array:
    """Rotation quaternion for angular velocity `omega` over timestep `dt`.

    Exact exponential map exp(omega * dt / 2), safe at |omega| -> 0 via the
    sinc expansion (no branch, jit-friendly).
    """
    rot_vec = 0.5 * jnp.asarray(dt) * omega
    angle = norm(rot_vec)
    # sin(a)/a via stable small-angle series switch
    small = angle < 1e-8
    safe = jnp.where(small, 1.0, angle)
    sinc = jnp.where(small, 1.0 - angle * angle / 6.0, jnp.sin(safe) / safe)
    return jnp.concatenate(
        [jnp.cos(angle)[..., None], sinc[..., None] * rot_vec], axis=-1
    )


def quat_integrate(q: Array, omega: Array, dt) -> Array:
    """One explicit step of dq/dt = 1/2 ω ⊗ q using the exponential map.

    Mirrors the reference's quaternion time-stepping in the node-Euler
    integrators (`scrap/motion/include/mundy_motion/`), but uses the exact
    exponential update (norm-preserving) instead of a normalized Euler step.
    """
    return quat_normalize(quat_multiply(quat_from_omega_dt(omega, dt), q))
