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
