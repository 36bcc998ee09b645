"""Centerline-twist rod + joints: frame transport, curvature, equilibrium."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.mech import (
    ball_joint_forces,
    init_rod_edges,
    rod_curvature,
    rod_internal_forces,
    update_rod_edges,
)
from mundy_tpu.math.quaternion import quat_identity, quat_rotate


def straight_chain(n, spacing=1.0):
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * spacing
    return jnp.asarray(pos)


def test_init_frames_orthonormal():
    pos = straight_chain(5)
    st = init_rod_edges(pos)
    # tangent = +x
    np.testing.assert_allclose(np.asarray(st.tangent), np.tile([1, 0, 0], (4, 1)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.length), 1.0, atol=1e-12)
    # frame z-axis (body z rotated by q) must equal the tangent
    zhat = jnp.asarray([0.0, 0.0, 1.0])
    d3 = quat_rotate(st.edge_q, jnp.broadcast_to(zhat, st.tangent.shape))
    np.testing.assert_allclose(np.asarray(d3), np.asarray(st.tangent), atol=1e-9)


def test_straight_rod_zero_curvature():
    st = init_rod_edges(straight_chain(6))
    _, kappa = rod_curvature(st)
    np.testing.assert_allclose(np.asarray(kappa), 0.0, atol=1e-9)


def test_bent_rod_curvature_magnitude():
    # 90-degree bend at node 1: kappa = 2 vec(g); |vec| = 2 sin(theta/2)...
    pos = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1.0, 0]])
    st = init_rod_edges(pos)
    _, kappa = rod_curvature(st)
    # rotation between edge frames is 90deg about z (tangent x -> y)
    expect_mag = 2 * np.sin(np.pi / 4)
    assert np.isclose(np.linalg.norm(np.asarray(kappa)[0]), expect_mag, atol=1e-6)


def test_parallel_transport_preserves_material_frame():
    """Transporting a frame around an out-and-back path with unchanged
    tangents returns the same frame (no spurious twist for identity moves)."""
    pos = straight_chain(4)
    st0 = init_rod_edges(pos)
    st1 = update_rod_edges(st0, pos)  # no motion
    np.testing.assert_allclose(np.asarray(st1.edge_q), np.asarray(st0.edge_q), atol=1e-9)

    # rigid rotation of the whole chain rotates the frames consistently
    from mundy_tpu.math.quaternion import quat_from_axis_angle

    q = quat_from_axis_angle(jnp.asarray([0.0, 0, 1]), 0.3)
    pos_rot = quat_rotate(q, pos)
    st2 = update_rod_edges(st0, pos_rot)
    d3 = quat_rotate(st2.edge_q, jnp.broadcast_to(jnp.asarray([0.0, 0, 1.0]), st2.tangent.shape))
    np.testing.assert_allclose(np.asarray(d3), np.asarray(st2.tangent), atol=1e-9)


def test_straight_rest_rod_equilibrium():
    """Straight rod at rest length with zero rest curvature: zero forces."""
    pos = straight_chain(6)
    st = init_rod_edges(pos)
    f, tau = rod_internal_forces(st, pos, rest_curvature=jnp.zeros((4, 3)),
                                 bend_modulus=1.0, stretch_stiffness=10.0,
                                 rest_length=1.0)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-9)


def test_stretch_force_restores():
    pos = straight_chain(3, spacing=1.2)  # stretched vs rest 1.0
    st = init_rod_edges(pos)
    f, _ = rod_internal_forces(st, pos, rest_curvature=jnp.zeros((1, 3)),
                               bend_modulus=0.0, stretch_stiffness=10.0,
                               rest_length=1.0)
    f = np.asarray(f)
    # end nodes pulled inward, middle balanced; momentum-free
    assert f[0, 0] > 0 and f[2, 0] < 0
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(f[1], 0.0, atol=1e-9)


def test_bending_force_straightens():
    """Slightly bent rod with straight rest shape relaxes toward straight
    under overdamped centerline-twist dynamics (positions + twist evolve;
    energy must decrease toward zero)."""
    pos = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0.3, 0], [3.0, 0.3, 0]])
    st = init_rod_edges(pos)

    def bend_energy(st):
        _, kappa = rod_curvature(st)
        return float(jnp.sum(kappa**2))

    e0 = bend_energy(st)
    energies = [e0]
    p = pos

    @jax.jit
    def jit_step(st, p):
        f, tau = rod_internal_forces(st, p, rest_curvature=jnp.zeros((2, 3)),
                                     bend_modulus=1.0, stretch_stiffness=50.0,
                                     rest_length=1.0)
        p = p + 0.002 * f
        return update_rod_edges(st, p, twist_rate=2.0 * tau, dt=0.002), p

    for _ in range(150):
        st, p = jit_step(st, p)
        energies.append(bend_energy(st))
    e1 = energies[-1]
    assert e1 < 0.1 * e0
    # monotone decrease (up to tiny numerical jitter)
    diffs = np.diff(energies)
    assert (diffs < 1e-6).all()
    assert np.isfinite(np.asarray(p)).all()


def test_momentum_conservation_random(rng):
    pos = jnp.asarray(rng.normal(size=(8, 3)) * 0.3 + straight_chain(8))
    st = init_rod_edges(pos)
    f, _ = rod_internal_forces(st, pos, rest_curvature=jnp.zeros((6, 3)),
                               bend_modulus=2.0, stretch_stiffness=5.0,
                               rest_length=1.0)
    np.testing.assert_allclose(np.asarray(f).sum(axis=0), 0.0, atol=1e-8)


def test_ball_joint():
    pos = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]])
    quat = quat_identity((2,), jnp.float64)
    f, tau = ball_joint_forces(pos, quat,
                               jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
                               jnp.asarray([[1.0, 0, 0]]), jnp.asarray([[-1.0, 0, 0]]),
                               stiffness=10.0)
    # attachment points at (1,0,0) and (2,0,0): gap 1 -> force 10 pulling together
    np.testing.assert_allclose(np.asarray(f[0]), [10.0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(f[1]), [-10.0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(f).sum(axis=0), 0.0, atol=1e-12)
