"""Rod suspension app (BASELINE config #3) on CPU."""

import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim
from mundy_tpu.math.quaternion import quat_rotate


def cfg(**kw):
    base = dict(num_rods=150, box_size=14.0, radius=0.25, length=1.5,
                youngs_modulus=500.0, dt=2e-4, num_steps=50, skin=0.3,
                dtype="float64", chunk=256, log_every=1000)
    base.update(kw)
    return RodsConfig(**base)


def test_rod_overlaps_relax():
    sim = RodsSim(cfg())
    state = sim.init()
    o0 = sim.max_overlap(state)
    assert o0 > 0.05
    state = sim.run_block(state, 300)
    assert not bool(state.overflow)
    assert sim.max_overlap(state) < 0.6 * o0
    # quaternions stay unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(state.quat), axis=1), 1.0,
                               atol=1e-9)


def test_contact_torque_two_rods():
    """Perpendicular crossed rods touching off-center: contact induces
    torque that rotates them apart."""
    sim = RodsSim(cfg(num_rods=2, box_size=14.0))
    state = sim.init()
    # rod 0 along x at origin, rod 1 along y, offset so contact is off-center
    from mundy_tpu.math.quaternion import quat_from_axis_angle

    qx = quat_from_axis_angle(jnp.asarray([0.0, 1, 0], jnp.float64), jnp.pi / 2)
    qy = quat_from_axis_angle(jnp.asarray([1.0, 0, 0], jnp.float64), jnp.pi / 2)
    pos = jnp.asarray([[7.0, 7.0, 7.0], [7.5, 7.0, 7.4]], jnp.float64)
    state = state.replace(pos=pos, quat=jnp.stack([qx, qy]))
    state = sim._rebuild(state)
    f, tau = sim._contact_forces_torques(state.pos, state.quat, state.nmat)
    f, tau = np.asarray(f), np.asarray(tau)
    # rods overlap (z-gap 0.4 < 2r=0.5): repulsive force along z
    assert f[0, 2] < 0 < f[1, 2]
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-10)
    # off-center contact -> nonzero torque on rod 0 (contact at x=+0.5)
    assert abs(tau[0, 1]) > 1e-8


def test_rotational_diffusion():
    """Free rods: axis decorrelation <u(t).u(0)> = exp(-2 Dr t)."""
    Dr = 0.5
    sim = RodsSim(cfg(num_rods=1500, box_size=200.0, rot_diffusion_coeff=Dr,
                      dt=1e-3, chunk=2048))
    state = sim.init()
    zhat = jnp.asarray([0.0, 0, 1.0], jnp.float64)
    u0 = np.asarray(quat_rotate(state.quat, zhat))
    n_steps = 120
    state = sim.run_block(state, n_steps)
    u1 = np.asarray(quat_rotate(state.quat, zhat))
    corr = (u0 * u1).sum(axis=1).mean()
    t = n_steps * 1e-3
    expect = np.exp(-2 * Dr * t)
    assert np.isclose(corr, expect, atol=0.03)


def test_deterministic():
    sim = RodsSim(cfg())
    s1 = sim.run_block(sim.init(), 20)
    s2 = sim.run_block(sim.init(), 20)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(s1.quat), np.asarray(s2.quat))


def test_ellipsoid_shape_overlaps_relax():
    """shape="ellipsoid": prolate ellipsoids resolve overlaps through the
    in-kernel shared-normal minimization (PGD + L-BFGS polish) — the
    reference's EllipsoidEllipsoid narrow phase in a production pipeline."""
    sim = RodsSim(cfg(num_rods=80, shape="ellipsoid", engine="nmat",
                      num_steps=50))
    state = sim.init()
    f0, _, _n0 = sim._contact_forces_torques_ellipsoid(state.pos, state.quat,
                                                  state.nmat)
    assert float(jnp.max(jnp.abs(f0))) > 0  # random init has contacts
    state = sim.run_block(state, 250)
    assert not bool(state.overflow)
    f1, _, _n1 = sim._contact_forces_torques_ellipsoid(state.pos, state.quat,
                                                  state.nmat)
    # overlaps relax: residual contact force far below the initial
    assert float(jnp.max(jnp.abs(f1))) < 0.3 * float(jnp.max(jnp.abs(f0)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(state.quat), axis=1),
                               1.0, atol=1e-9)


def test_ellipsoid_anisotropic_torque():
    """Two crossed prolate ellipsoids: the shared-normal contact produces
    equal-and-opposite forces and a torque that rotates them apart."""
    sim = RodsSim(cfg(num_rods=2, shape="ellipsoid", engine="nmat"))
    state = sim.init()
    from mundy_tpu.math.quaternion import quat_from_axis_angle

    qx = quat_from_axis_angle(jnp.asarray([0.0, 1, 0], jnp.float64), jnp.pi / 2)
    qy = quat_from_axis_angle(jnp.asarray([1.0, 0, 0], jnp.float64), jnp.pi / 2)
    pos = jnp.asarray([[7.0, 7.0, 7.0], [7.5, 7.0, 7.4]], jnp.float64)
    state = state.replace(pos=pos, quat=jnp.stack([qx, qy]))
    state = sim._rebuild(state)
    f, tau, _n = sim._contact_forces_torques_ellipsoid(state.pos, state.quat,
                                                       state.nmat)
    f, tau = np.asarray(f), np.asarray(tau)
    assert f[0, 2] < 0 < f[1, 2]  # pushed apart along z
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-8)
    assert abs(tau[0, 1]) > 1e-8  # off-center contact -> torque


def test_ellipsoid_warm_start_matches_cold():
    """Temporal warm start (seed the PGD from the previous step's converged
    normal, skip the multistart) must reproduce cold-start distances to
    polish tolerance while contacts persist, and the warm-started app
    trajectory must track the cold-start one."""
    import jax

    sim = RodsSim(cfg(num_rods=80, shape="ellipsoid", engine="nmat",
                      length=1.2, box_size=12.0, dt=5e-5,
                      ellipsoid_warm_start=True))
    state = sim.init()
    # one step forward so positions moved a bit off the seed geometry
    state = sim.run_block(state, 3)

    res_cold, _i = sim._ellipsoid_narrow(state.pos, state.quat, state.nmat)
    res_warm, _i = sim._ellipsoid_narrow(state.pos, state.quat, state.nmat,
                                         warm_n=state.warm_n)
    mask = np.asarray(state.nmat.mask)
    dc = np.asarray(res_cold.dist)[mask]
    dw = np.asarray(res_warm.dist)[mask]
    # near-contact slots (the force-bearing ones): warm and cold sit in
    # the SAME basin, differing only by the PGD/polish tail (~1e-2 at
    # these anisotropies — cold itself is ~1e-2 from a 128-iter truth
    # solve). Far slots may settle in different stationary points of the
    # shared-normal objective; they carry no force and are re-seeded from
    # the center-line direction every step (no basin trapping).
    near = dc < 0.5 * sim.config.radius
    np.testing.assert_allclose(dw[near], dc[near], rtol=0, atol=0.03)
    # no missed contacts: every cold-detected contact is warm-detected
    contact = dc < 0.0
    assert (dw[contact] < 0.01).all()

    # warm app trajectory stays physical and tracks the cold app
    sim_c = RodsSim(cfg(num_rods=80, shape="ellipsoid", engine="nmat",
                        length=1.2, box_size=12.0, dt=5e-5,
                        ellipsoid_warm_start=False))
    s_w = sim.run_block(state, 40)
    s_c0 = sim_c.init()
    s_c0 = sim_c.run_block(s_c0, 3)
    s_c = sim_c.run_block(s_c0, 40)
    jax.block_until_ready(s_c.pos)
    assert np.isfinite(np.asarray(s_w.pos)).all()
    # same physics to the narrow-phase tail tolerance, integrated over
    # the window (not bit-parity: the tails differ by ~1e-2 in force)
    np.testing.assert_allclose(np.asarray(s_w.pos), np.asarray(s_c.pos),
                               rtol=0, atol=5e-3)
