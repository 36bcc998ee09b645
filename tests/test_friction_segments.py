"""Frictional segment-segment contact (forces/friction.
frictional_segment_contact_rows) — the CollidingFrictionalSperm capability:
kernel physics on constructed pairs, Coulomb cap, history remap across
rebuilds, and app-level sliding suppression in RodsSim."""

import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.forces.friction import (frictional_segment_contact_rows,
                                       remap_row_history)

DT = jnp.float64


def _two_parallel_rods(gap=-0.1, vj=(1.0, 0.0, 0.0)):
    """Two parallel x-axis rods separated in y by 2r + gap; rod 1 moving
    with velocity vj. Returns kernel inputs (N=2, K=1 rows pointing at
    each other)."""
    radius, half = 0.5, 1.0
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2 * radius + gap, 0.0]], DT)
    hedge = jnp.asarray([[half, 0.0, 0.0], [half, 0.0, 0.0]], DT)
    vel = jnp.asarray([[0.0, 0.0, 0.0], list(vj)], DT)
    omega = jnp.zeros((2, 3), DT)
    idx = jnp.asarray([[1], [0]], jnp.int32)
    mask = jnp.ones((2, 1), bool)
    tang = jnp.zeros((2, 1, 3), DT)
    return pos, hedge, vel, omega, idx, mask, tang, radius


def _run(pos, hedge, vel, omega, idx, mask, tang, radius, steps=1,
         mu=0.5, k_t=100.0, dt=1e-3):
    res = None
    for _ in range(steps):
        res = frictional_segment_contact_rows(
            pos, hedge, vel, omega, idx, mask, tang, dt, radius,
            youngs=1000.0, poisson=0.3, tang_spring=k_t,
            friction_coeff=mu)
        tang = res.tang_disp
    return res


def test_friction_drags_along_relative_motion():
    """Rod 1 slides +x past static rod 0: the tangential force on rod 0
    points +x (drag), the reaction on rod 1 points -x, and the normal
    forces push the rods apart in -/+ y."""
    args = _two_parallel_rods(gap=-0.1, vj=(1.0, 0.0, 0.0))
    res = _run(*args, steps=3)
    f = np.asarray(res.forces)
    assert f[0, 0] > 0.0 and f[1, 0] < 0.0  # drag along slip
    assert np.isclose(f[0, 0], -f[1, 0])  # action-reaction
    assert f[0, 1] < 0.0 and f[1, 1] > 0.0  # normal separation push
    assert np.asarray(res.normal_mag).max() > 0.0
    # history accumulated along the slip direction on rod 0's row
    assert np.asarray(res.tang_disp)[0, 0, 0] > 0.0


def test_coulomb_cap_engages():
    """Accumulating slip grows |F_t| until the cap: |F_t| = mu |F_n|."""
    args = _two_parallel_rods(gap=-0.1, vj=(1.0, 0.0, 0.0))
    mu = 0.3
    res = _run(*args, steps=200, mu=mu, k_t=1e4)
    f = np.asarray(res.forces)
    fn = float(np.asarray(res.normal_mag)[0, 0])
    ft = abs(f[0, 0])
    assert ft == pytest.approx(mu * fn, rel=1e-6)


def test_history_resets_on_separation():
    pos, hedge, vel, omega, idx, mask, tang, radius = _two_parallel_rods()
    tang = tang.at[0, 0, 0].set(0.5)  # stale history
    sep_pos = pos.at[1, 1].set(5.0)  # far apart now
    res = frictional_segment_contact_rows(
        sep_pos, hedge, vel, omega, idx, mask, tang, 1e-3, radius,
        youngs=1000.0, poisson=0.3, tang_spring=100.0, friction_coeff=0.5)
    assert float(jnp.abs(res.tang_disp).max()) == 0.0
    assert float(jnp.abs(res.forces).max()) == 0.0


def test_torque_from_contact_point():
    """The TANGENTIAL force's moment: slip along +x applied at the contact
    offset +y*r from rod 0's axis adds a NEGATIVE z-torque relative to the
    frictionless (normal-only) contact — isolate it by differencing
    against a mu=0, k_t=0 run (for parallel segments the degenerate
    contact parameter gives the normal force its own moment)."""
    args = _two_parallel_rods(gap=-0.1, vj=(1.0, 0.0, 0.0))
    res_f = _run(*args, steps=3, mu=0.5, k_t=100.0)
    args0 = _two_parallel_rods(gap=-0.1, vj=(1.0, 0.0, 0.0))
    res_0 = _run(*args0, steps=3, mu=0.0, k_t=0.0)
    dtq = np.asarray(res_f.torques) - np.asarray(res_0.torques)
    # arm_y = +r on rod 0, dF = F_t = +x -> d(torque_z) = -arm_y * F_x < 0
    assert dtq[0, 2] < 0.0
    # and the normal part is identical between the two runs
    np.testing.assert_allclose(np.asarray(res_f.normal_mag),
                               np.asarray(res_0.normal_mag))


def test_remap_row_history_by_pair_identity():
    old_idx = jnp.asarray([[3, 7, 9]], jnp.int32)
    old_mask = jnp.asarray([[True, True, False]])
    old_vals = jnp.asarray([[[1.0, 0, 0], [2.0, 0, 0], [9.0, 0, 0]]], DT)
    new_idx = jnp.asarray([[7, 5, 3]], jnp.int32)
    new_mask = jnp.asarray([[True, True, True]])
    out = np.asarray(remap_row_history(old_idx, old_mask, old_vals,
                                       new_idx, new_mask))
    assert out[0, 0, 0] == 2.0  # id 7 carried
    assert out[0, 1, 0] == 0.0  # id 5 is new
    assert out[0, 2, 0] == 1.0  # id 3 carried
    # masked-out old slot (id 9) never leaks
    assert not np.any(out == 9.0)


@pytest.mark.slow
def test_rods_app_friction_suppresses_sliding():
    """Two crossed overlapping rods relaxing in RodsSim: with friction the
    contact-point slip (relative displacement transverse to the contact
    normal) is smaller than the frictionless relax — sliding is resisted
    while the normal push-off is identical physics."""
    import jax
    from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim

    def relax(mu):
        cfg = RodsConfig(num_rods=2, box_size=40.0, radius=0.25,
                         length=2.0, dt=2e-4, friction=(mu > 0),
                         friction_coeff=mu, tang_spring=500.0,
                         engine="nmat", dtype="float64", log_every=10**6)
        sim = RodsSim(cfg)
        state = sim.init()
        # nearly-parallel rods, slightly crossed, overlapping in y, and
        # OFFSET along x so the contact has room to slide axially
        pos = jnp.asarray([[20.0, 20.0, 20.0], [20.6, 20.4, 20.0]], DT)
        from mundy_tpu.math.quaternion import (quat_from_axis_angle,
                                                quat_multiply)
        q0 = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], DT), 0.0)
        q1 = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], DT), 0.15)
        # body z = rod axis: rotate z onto x first
        qx = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0], DT),
                                  np.pi / 2)
        quat = jnp.stack([quat_multiply(q0, qx), quat_multiply(q1, qx)])
        state = state.replace(pos=pos, quat=quat, ref_pos=pos)
        state = sim._rebuild(state)
        state = sim.run_block(state, 300)
        jax.block_until_ready(state.pos)
        return np.asarray(state.pos)

    p_free = relax(0.0)
    p_fric = relax(1.0)
    assert np.isfinite(p_free).all() and np.isfinite(p_fric).all()
    # friction is LIVE: the push-off trajectory differs measurably (the
    # rotation-induced contact slip is resisted; kernel-level tests pin
    # the force directions)
    assert np.abs(p_free - p_fric).max() > 1e-4
    # action-reaction through the app: equal drags, so the pair's center
    # is invariant under the internal (normal + tangential) forces
    c_free = p_free.mean(axis=0)
    c_fric = p_fric.mean(axis=0)
    np.testing.assert_allclose(c_fric, c_free, atol=1e-9)


@pytest.mark.slow
def test_rods_app_friction_history_survives_rebuild():
    """Persistent contact history is remapped (not dropped) across a
    neighbor rebuild in the rods app."""
    import jax
    import jax.numpy as jnp
    from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim
    from mundy_tpu.math.quaternion import quat_from_axis_angle, quat_multiply

    cfg = RodsConfig(num_rods=2, box_size=40.0, radius=0.25, length=2.0,
                     dt=2e-4, friction=True, friction_coeff=1.0,
                     tang_spring=500.0, engine="nmat", dtype="float64",
                     log_every=10**6)
    sim = RodsSim(cfg)
    state = sim.init()
    pos = jnp.asarray([[20.0, 20.0, 20.0], [20.6, 20.4, 20.0]], DT)
    qx = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0], DT), np.pi / 2)
    q1 = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], DT), 0.15)
    quat = jnp.stack([qx, quat_multiply(q1, qx)])
    state = state.replace(pos=pos, quat=quat, ref_pos=pos)
    state = sim._rebuild(state)
    for _ in range(20):
        state = sim._inner_step(state)
    pre = np.asarray(state.tang)
    assert np.abs(pre).max() > 0.0  # history accumulated in contact
    state = sim._rebuild(state)  # reorders rows
    post = np.asarray(state.tang)
    # the carried history per pair survives with identical values
    assert np.abs(post).max() == pytest.approx(np.abs(pre).max())
    jax.block_until_ready(state.pos)
