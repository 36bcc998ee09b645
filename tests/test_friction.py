"""Frictional Hertzian contact (granular DEM) tests."""

import jax.numpy as jnp
import numpy as np

from mundy_tpu.forces.friction import frictional_hertzian_contact
from mundy_tpu.neighbor import PairList


def one_pair(cap=4):
    return PairList(
        i=jnp.zeros(cap, jnp.int32).at[0].set(0),
        j=jnp.zeros(cap, jnp.int32).at[0].set(1),
        mask=jnp.zeros(cap, bool).at[0].set(True),
        num_pairs=jnp.asarray(1),
        overflow=jnp.asarray(False),
    )


def test_normal_repulsion():
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]], jnp.float64)  # overlap 0.5
    vel = jnp.zeros((2, 3), jnp.float64)
    out = frictional_hertzian_contact(
        pos, vel, 1.0, one_pair(), jnp.zeros((4, 3), jnp.float64), 1e-3,
        normal_spring=100.0, normal_damping=0.0, tang_spring=50.0,
        tang_damping=0.0, friction_coeff=0.5)
    f = np.asarray(out.forces)
    assert f[0, 0] < 0 < f[1, 0]  # pushed apart
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-12)
    # magnitude: hertz_poly * k_n * |sep| = sqrt(0.5*0.5)*100*0.5
    expect = np.sqrt(0.5 * 0.5) * 100 * 0.5
    np.testing.assert_allclose(abs(f[0, 0]), expect, rtol=1e-12)


def test_tangential_friction_and_coulomb_cap():
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]], jnp.float64)
    # relative tangential sliding along y
    vel = jnp.asarray([[0.0, 0, 0], [0.0, 2.0, 0]], jnp.float64)
    xi = jnp.zeros((4, 3), jnp.float64)
    mu = 0.3
    # accumulate history over steps: tangential force grows then caps
    ft_prev = 0.0
    capped = False
    for _ in range(200):
        out = frictional_hertzian_contact(
            pos, vel, 1.0, one_pair(), xi, 1e-3,
            normal_spring=100.0, normal_damping=0.0, tang_spring=200.0,
            tang_damping=0.0, friction_coeff=mu)
        xi = out.tang_disp
        ft = float(np.linalg.norm(np.asarray(out.forces)[0] -
                                  np.asarray([out.forces[0, 0], 0, 0])))
        fn = float(out.normal_force_mag[0])
        assert ft <= mu * fn + 1e-9  # Coulomb law holds at every step
        if abs(ft - mu * fn) < 1e-9:
            capped = True
        ft_prev = ft
    assert capped  # sliding long enough saturates the cap


def test_history_resets_out_of_contact():
    pos = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]], jnp.float64)  # separated
    vel = jnp.zeros((2, 3), jnp.float64)
    xi0 = jnp.ones((4, 3), jnp.float64)
    out = frictional_hertzian_contact(
        pos, vel, 1.0, one_pair(), xi0, 1e-3,
        normal_spring=100.0, normal_damping=0.0, tang_spring=50.0,
        tang_damping=0.0, friction_coeff=0.5)
    np.testing.assert_allclose(np.asarray(out.tang_disp), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.forces), 0.0, atol=1e-14)


def test_torques_oppose_sliding():
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]], jnp.float64)
    vel = jnp.asarray([[0.0, 0, 0], [0.0, 1.0, 0]], jnp.float64)
    xi = jnp.zeros((4, 3), jnp.float64)
    out = frictional_hertzian_contact(
        pos, vel, 1.0, one_pair(), xi, 1e-2,
        normal_spring=100.0, normal_damping=0.0, tang_spring=200.0,
        tang_damping=1.0, friction_coeff=0.5)
    t = np.asarray(out.torques)
    # tangential force at contact induces torque about z on both bodies
    assert abs(t[0, 2]) > 0


def _press_and_drag(mu, f_n, f_t, steps=30000, dt=2e-4):
    """Body 1 pressed against fixed body 0 by normal force f_n (-x) plus
    tangential force f_t (+y): the inclined-plane stick/slip threshold in
    force form (tan(theta) = f_t/f_n). Returns (v_t_final, v_t_threequarter).

    At equilibrium the contact's normal force magnitude equals f_n exactly
    (independent of spring constants), so the Coulomb cap admits static
    balance iff f_t <= mu * f_n — the reference's frictional kernel
    convention (Coulomb cap with history rescale, `...FrictionalHertzian
    Contact.cpp:497-513`)."""
    import jax

    m = (4.0 / 3.0) * np.pi * 1.0 * 1.0**3  # density 1, radius 1
    f_ext = jnp.asarray([-f_n, f_t, 0.0], jnp.float64)

    def step(carry, _):
        pos, vel, xi = carry
        out = frictional_hertzian_contact(
            pos, vel, 1.0, one_pair(), xi, dt,
            normal_spring=500.0, normal_damping=50.0, tang_spring=500.0,
            tang_damping=50.0, friction_coeff=mu)
        v1 = vel[1] + (dt / m) * (out.forces[1] + f_ext)
        vel = jnp.stack([jnp.zeros(3, jnp.float64), v1])
        pos = pos.at[1].add(dt * v1)
        return (pos, vel, out.tang_disp), None

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(carry, k):
        return jax.lax.scan(step, carry, None, length=k)[0]

    pos = jnp.asarray([[0.0, 0, 0], [1.97, 0, 0]], jnp.float64)
    carry = (pos, jnp.zeros((2, 3), jnp.float64),
             jnp.zeros((4, 3), jnp.float64))
    carry = run(carry, 3 * steps // 4)
    v_tq = float(carry[1][1, 1])
    carry = run(carry, steps - 3 * steps // 4)
    return float(carry[1][1, 1]), v_tq


def test_stick_below_coulomb_threshold():
    """f_t/f_n = 0.4 < mu = 0.5: static equilibrium (the mu = tan(theta)
    inclined-plane stick condition). Velocity damps to ~0 and stays."""
    v_end, v_tq = _press_and_drag(mu=0.5, f_n=1.0, f_t=0.4)
    assert abs(v_end) < 1e-4, (v_end, v_tq)
    assert abs(v_tq) < 1e-3, v_tq


def test_slip_above_coulomb_threshold():
    """f_t/f_n = 0.65 > mu = 0.5: the cap limits tangential contact force
    to mu*f_n, so the residual (f_t - mu*f_n) accelerates the body —
    velocity keeps GROWING (sliding), in contrast to the stick case."""
    v_end, v_tq = _press_and_drag(mu=0.5, f_n=1.0, f_t=0.65)
    m = (4.0 / 3.0) * np.pi
    assert v_end > v_tq + 1e-3, (v_tq, v_end)  # still accelerating
    # terminal-free sliding: a ~ (f_t - mu f_n)/m; allow contact transients
    assert v_end > 0.5 * (0.65 - 0.5) / m * (30000 * 2e-4)


def _head_on_restitution(damping, v0=1.0):
    """Equal spheres collide head-on at relative speed 2*v0; returns the
    rebound/approach relative-speed ratio (coefficient of restitution)."""
    import jax

    m = (4.0 / 3.0) * np.pi
    dt = 1e-4

    def step(carry, _):
        pos, vel, xi = carry
        out = frictional_hertzian_contact(
            pos, vel, 1.0, one_pair(), xi, dt,
            normal_spring=2000.0, normal_damping=damping, tang_spring=1000.0,
            tang_damping=0.0, friction_coeff=0.5)
        vel = vel + (dt / m) * out.forces
        pos = pos + dt * vel
        return (pos, vel, out.tang_disp), None

    @jax.jit
    def run(carry):
        return jax.lax.scan(step, carry, None, length=8000)[0]

    pos = jnp.asarray([[0.0, 0, 0], [2.2, 0, 0]], jnp.float64)
    vel = jnp.asarray([[v0, 0, 0], [-v0, 0, 0]], jnp.float64)
    carry = run((pos, vel, jnp.zeros((4, 3), jnp.float64)))
    assert float(carry[0][1, 0] - carry[0][0, 0]) > 2.2  # separated again
    return float(carry[1][1, 0] - carry[1][0, 0]) / (2.0 * v0)


def test_restitution_sweep_monotone():
    """e(0) ~ 1 (elastic) and e decreases monotonically with the normal
    dashpot coefficient — the spring-dashpot model's defining behavior."""
    es = [_head_on_restitution(c) for c in (0.0, 2.0, 8.0, 32.0)]
    assert es[0] > 0.97, es
    for a, b in zip(es, es[1:]):
        assert b < a - 1e-3, es
    assert es[-1] < 0.6, es
