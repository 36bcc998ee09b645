"""Boundary-integral periphery vs analytic no-slip solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.mobility.periphery import (
    build_sphere_periphery,
    double_layer_flow,
    gen_sphere_quadrature,
    no_slip_correction,
    skfie_matrix,
    surface_densities,
)


def test_quadrature_integrates_area():
    pts, wts, nrm = gen_sphere_quadrature(order=16, radius=2.0)
    # total weight = surface area 4 pi R^2
    np.testing.assert_allclose(wts.sum(), 4 * np.pi * 4.0, rtol=1e-10)
    # points on the sphere, normals inward unit
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.0, rtol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, rtol=1e-12)
    assert np.all(np.sum(pts * nrm, axis=1) < 0)  # inward

    # quadrature integrates smooth functions: int z^2 dA = 4 pi R^4 / 3
    z2 = pts[:, 2] ** 2
    np.testing.assert_allclose((z2 * wts).sum(), 4 * np.pi * 16.0 / 3.0, rtol=1e-8)


def test_skfie_matrix_invertible():
    pts, wts, nrm = gen_sphere_quadrature(order=8, radius=1.0)
    M = skfie_matrix(pts, nrm, wts)
    assert M.shape == (3 * len(pts), 3 * len(pts))
    cond = np.linalg.cond(M)
    assert cond < 1e4  # second-kind Fredholm: well-conditioned


def test_uniform_flow_cancelled_inside():
    """A rigid no-slip sphere in ambient uniform flow U: the unique interior
    Stokes solution with boundary data -U is the constant -U, so the
    correction must cancel the ambient flow at every interior point."""
    per = build_sphere_periphery(order=12, radius=1.0, dtype=jnp.float64)
    U = jnp.asarray([1.0, 0.0, 0.0])
    u_surface = jnp.broadcast_to(U, per.points.shape)
    targets = jnp.asarray([
        [0.0, 0.0, 0.0],
        [0.3, 0.2, -0.1],
        [0.0, 0.5, 0.0],
        [-0.4, 0.1, 0.3],
    ])
    corr = no_slip_correction(per, u_surface, targets)
    np.testing.assert_allclose(np.asarray(corr), np.tile(-np.asarray(U), (4, 1)),
                               atol=2e-3)


def test_shear_flow_cancelled_inside():
    """Non-constant data: ambient shear u = (z, 0, 0) is itself a Stokes
    flow, so the correction must equal -u(x) at interior points."""
    per = build_sphere_periphery(order=16, radius=1.0, dtype=jnp.float64)
    u_surface = jnp.stack(
        [per.points[:, 2], jnp.zeros_like(per.points[:, 2]),
         jnp.zeros_like(per.points[:, 2])], axis=1)
    targets = jnp.asarray([[0.0, 0.0, 0.5], [0.2, -0.3, -0.4], [0.0, 0.0, 0.0]])
    corr = no_slip_correction(per, u_surface, targets)
    expect = -np.stack([np.asarray(targets)[:, 2], np.zeros(3), np.zeros(3)], axis=1)
    np.testing.assert_allclose(np.asarray(corr), expect, atol=5e-3)


def test_correction_scales_linearly():
    per = build_sphere_periphery(order=8, radius=1.0, dtype=jnp.float64)
    u1 = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), per.points.shape)
    t = jnp.asarray([[0.2, 0.0, 0.0]])
    c1 = no_slip_correction(per, u1, t)
    c2 = no_slip_correction(per, 2.0 * u1, t)
    np.testing.assert_allclose(np.asarray(c2), 2 * np.asarray(c1), rtol=1e-10)


def test_cache_round_trip(tmp_path):
    cache = str(tmp_path / "minv.npy")
    p1 = build_sphere_periphery(order=4, radius=1.0, cache_path=cache, dtype=jnp.float64)
    assert os.path.exists(cache)
    p2 = build_sphere_periphery(order=4, radius=1.0, cache_path=cache, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(p1.m_inv), np.asarray(p2.m_inv))


import os  # noqa: E402


def test_confined_mobility_suppressed():
    """A bead dragged inside a no-slip spherical shell moves slower than in
    free space, and slower still near the wall (the confined-diffusion
    sanity check for the rpy_periphery hydro mode)."""
    import jax.numpy as jnp

    from mundy_tpu.mobility import (
        build_sphere_periphery,
        no_slip_correction,
        rpy_flow_at,
        rpy_self_mobility,
    )

    R, a, mu = 10.0, 0.5, 1.0
    peri = build_sphere_periphery(14, R, dtype=jnp.float64)
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)

    def mobility_x(pos_np):
        pos = jnp.asarray(pos_np, jnp.float64)
        u = rpy_self_mobility(f, a, mu)  # single bead: only the self term
        u_surf = rpy_flow_at(peri.points, pos, f, a, mu)
        u = u + no_slip_correction(peri, u_surf, pos)
        return float(u[0, 0])

    free = float(rpy_self_mobility(f, a, mu)[0, 0])
    center = mobility_x(np.zeros((1, 3)))
    near_wall = mobility_x(np.array([[R - 3 * a, 0.0, 0.0]]))
    assert near_wall < center < free
    # center of a concentric cavity: leading wall correction ~ 1 - O(a/R)
    assert 0.7 * free < center < 0.99 * free
    assert near_wall < 0.8 * free
