"""Quaternion algebra vs analytic rotations.

Mirrors reference `mundy/math/tests/unit_tests/UnitTestQuaternion.cpp` intent:
validate products, rotations, matrix round-trips, slerp, and integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.math import (
    quat_conjugate,
    quat_from_axis_angle,
    quat_from_matrix,
    quat_from_omega_dt,
    quat_identity,
    quat_integrate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    quat_to_matrix,
)


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))


def test_identity_rotation(rng):
    v = jnp.asarray(rng.normal(size=(10, 3)))
    q = quat_identity((10,), dtype=v.dtype)
    np.testing.assert_allclose(quat_rotate(q, v), v, atol=1e-14)


def test_axis_angle_90deg_z():
    q = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_rotate(q, v), [0.0, 1.0, 0.0], atol=1e-12)


def test_multiply_composes_rotations(rng):
    q1 = random_unit_quats(rng, 50)
    q2 = random_unit_quats(rng, 50)
    v = jnp.asarray(rng.normal(size=(50, 3)))
    lhs = quat_rotate(quat_multiply(q1, q2), v)
    rhs = quat_rotate(q1, quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_conjugate_inverts(rng):
    q = random_unit_quats(rng, 20)
    v = jnp.asarray(rng.normal(size=(20, 3)))
    np.testing.assert_allclose(quat_rotate(quat_conjugate(q), quat_rotate(q, v)), v, atol=1e-12)


def test_matrix_round_trip(rng):
    q = random_unit_quats(rng, 100)
    m = quat_to_matrix(q)
    # rotation matrix orthonormality
    eye = jnp.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (100, 3, 3)), atol=1e-12)
    q2 = quat_from_matrix(m)
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_matrix_matches_rotation(rng):
    q = random_unit_quats(rng, 30)
    v = jnp.asarray(rng.normal(size=(30, 3)))
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", quat_to_matrix(q), v), quat_rotate(q, v), atol=1e-12
    )


def test_slerp_endpoints_and_midpoint():
    q0 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.0)
    q1 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
    np.testing.assert_allclose(quat_slerp(q0, q1, 1.0), q1, atol=1e-12)
    mid = quat_slerp(q0, q1, 0.5)
    expect = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4)
    np.testing.assert_allclose(mid, expect, atol=1e-12)


def test_omega_integration_matches_axis_angle():
    omega = jnp.array([0.0, 0.0, 2.0])  # rad/s about z
    dt = 0.25
    dq = quat_from_omega_dt(omega, dt)
    expect = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.5)
    np.testing.assert_allclose(dq, expect, atol=1e-12)

    q = quat_identity(dtype=jnp.float64)
    for _ in range(4):
        q = quat_integrate(q, omega, dt)
    expect = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 2.0)
    np.testing.assert_allclose(q, expect, atol=1e-12)


def test_zero_omega_is_identity():
    dq = quat_from_omega_dt(jnp.zeros(3), 0.1)
    np.testing.assert_allclose(dq, [1.0, 0.0, 0.0, 0.0], atol=1e-14)


def test_jit_and_vmap(rng):
    q = random_unit_quats(rng, 64)
    v = jnp.asarray(rng.normal(size=(64, 3)))
    out1 = jax.jit(quat_rotate)(q, v)
    out2 = jax.vmap(quat_rotate)(q, v)
    np.testing.assert_allclose(out1, out2, atol=1e-14)
