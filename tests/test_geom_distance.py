"""Distance kernels vs analytic solutions and brute-force sampling.

Mirrors reference geom unit tests (segment-segment & ellipsoid-ellipsoid
distances, AABB, periodicity — SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.geom import (
    Circle3D,
    Ellipsoid,
    LineSegment,
    Plane,
    Sphere,
    Spherocylinder,
    SpherocylinderSegment,
    VSegment,
    distance_circle3d_circle3d,
    distance_ellipsoid_ellipsoid,
    distance_line_line,
    distance_plane_ellipsoid,
    distance_plane_plane,
    distance_plane_sphere,
    distance_point_ellipsoid,
    distance_point_plane,
    distance_point_point,
    distance_point_segment,
    distance_point_sphere,
    distance_point_vsegment,
    distance_scsegment_scsegment,
    distance_segment_ellipsoid,
    distance_segment_plane,
    distance_segment_segment,
    distance_segment_sphere,
    distance_sphere_ellipsoid,
    distance_sphere_scsegment,
    distance_sphere_sphere,
    distance_spherocylinder_spherocylinder,
    free_space,
    periodic,
)
from mundy_tpu.math.quaternion import quat_from_axis_angle, quat_identity, quat_rotate


def v(*xs):
    return jnp.asarray(xs, dtype=jnp.float64)


# --------------------------------------------------------------- basic pairs
def test_point_point():
    r = distance_point_point(v(0, 0, 0), v(3, 4, 0))
    assert np.isclose(float(r.dist), 5.0)
    np.testing.assert_allclose(r.normal, [0.6, 0.8, 0.0], atol=1e-14)


def test_point_segment_cases():
    seg = LineSegment(v(0, 0, 0), v(1, 0, 0))
    # interior projection
    assert np.isclose(float(distance_point_segment(v(0.5, 2, 0), seg).dist), 2.0)
    # clamped to endpoints
    assert np.isclose(float(distance_point_segment(v(-3, 4, 0), seg).dist), 5.0)
    assert np.isclose(float(distance_point_segment(v(4, 4, 0), seg).dist), 5.0)


def test_point_plane_signed():
    pl = Plane(v(0, 0, 0), v(0, 0, 1))
    assert np.isclose(float(distance_point_plane(v(1, 2, 3), pl).dist), 3.0)
    assert np.isclose(float(distance_point_plane(v(1, 2, -3), pl).dist), -3.0)


def test_point_sphere_signed():
    s = Sphere(v(0, 0, 0), jnp.asarray(1.0))
    assert np.isclose(float(distance_point_sphere(v(3, 0, 0), s).dist), 2.0)
    assert np.isclose(float(distance_point_sphere(v(0.5, 0, 0), s).dist), -0.5)


def test_sphere_sphere_overlap_and_normal():
    s1 = Sphere(v(0, 0, 0), jnp.asarray(1.0))
    s2 = Sphere(v(1.5, 0, 0), jnp.asarray(1.0))
    r = distance_sphere_sphere(s1, s2)
    assert np.isclose(float(r.dist), -0.5)
    np.testing.assert_allclose(r.normal, [1, 0, 0], atol=1e-14)
    np.testing.assert_allclose(r.point1, [1, 0, 0], atol=1e-14)
    np.testing.assert_allclose(r.point2, [0.5, 0, 0], atol=1e-14)


def test_line_line_skew_and_parallel():
    # skew lines: z-offset 2
    r = distance_line_line(v(0, 0, 0), v(1, 0, 0), v(0, 0, 2), v(0, 1, 0))
    assert np.isclose(float(r.dist), 2.0)
    # parallel
    r = distance_line_line(v(0, 0, 0), v(1, 0, 0), v(0, 3, 0), v(1, 0, 0))
    assert np.isclose(float(r.dist), 3.0)


# ----------------------------------------------------------- segment-segment
def test_segment_segment_analytic_cases():
    # crossing (perpendicular, z-gap 1)
    a = LineSegment(v(-1, 0, 0), v(1, 0, 0))
    b = LineSegment(v(0, -1, 1), v(0, 1, 1))
    r = distance_segment_segment(a, b)
    assert np.isclose(float(r.dist), 1.0)
    np.testing.assert_allclose(r.point1, [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(r.point2, [0, 0, 1], atol=1e-12)

    # endpoint-to-endpoint
    b = LineSegment(v(2, 0, 0), v(3, 0, 0))
    r = distance_segment_segment(a, b)
    assert np.isclose(float(r.dist), 1.0)

    # parallel overlapping (colinear offset)
    b = LineSegment(v(-1, 2, 0), v(1, 2, 0))
    r = distance_segment_segment(a, b)
    assert np.isclose(float(r.dist), 2.0)

    # degenerate: both segments are points
    r = distance_segment_segment(
        LineSegment(v(0, 0, 0), v(0, 0, 0)), LineSegment(v(0, 3, 4), v(0, 3, 4))
    )
    assert np.isclose(float(r.dist), 5.0)


def test_segment_segment_brute_force(rng):
    """Random segment pairs vs dense parameter-grid sampling."""
    n = 200
    a0 = rng.normal(size=(n, 3))
    a1 = rng.normal(size=(n, 3))
    b0 = rng.normal(size=(n, 3))
    b1 = rng.normal(size=(n, 3))
    r = distance_segment_segment(
        LineSegment(jnp.asarray(a0), jnp.asarray(a1)),
        LineSegment(jnp.asarray(b0), jnp.asarray(b1)),
    )
    ts = np.linspace(0, 1, 201)
    pa = a0[:, None, :] + ts[None, :, None] * (a1 - a0)[:, None, :]
    pb = b0[:, None, :] + ts[None, :, None] * (b1 - b0)[:, None, :]
    d2 = np.sum((pa[:, :, None, :] - pb[:, None, :, :]) ** 2, axis=-1)
    brute = np.sqrt(d2.reshape(n, -1).min(axis=1))
    np.testing.assert_allclose(np.asarray(r.dist), brute, atol=2e-3)
    assert (np.asarray(r.dist) <= brute + 1e-12).all()  # exact <= sampled


# ------------------------------------------------------------------ capsules
def test_capsule_pairs():
    sc1 = SpherocylinderSegment(v(-1, 0, 0), v(1, 0, 0), jnp.asarray(0.25))
    sc2 = SpherocylinderSegment(v(0, -1, 1), v(0, 1, 1), jnp.asarray(0.25))
    r = distance_scsegment_scsegment(sc1, sc2)
    assert np.isclose(float(r.dist), 0.5)
    np.testing.assert_allclose(r.point1, [0, 0, 0.25], atol=1e-12)
    np.testing.assert_allclose(r.point2, [0, 0, 0.75], atol=1e-12)

    s = Sphere(v(0, 0, 2), jnp.asarray(0.5))
    r = distance_sphere_scsegment(s, sc1)
    assert np.isclose(float(r.dist), 1.25)


def test_spherocylinder_orientation_form():
    # capsule along z (body z-axis, identity orientation), length 2, radius 0.3
    q = quat_identity((), jnp.float64)
    sc1 = Spherocylinder(v(0, 0, 0), q, jnp.asarray(0.3), jnp.asarray(2.0))
    sc2 = Spherocylinder(v(3, 0, 0), q, jnp.asarray(0.3), jnp.asarray(2.0))
    r = distance_spherocylinder_spherocylinder(sc1, sc2)
    assert np.isclose(float(r.dist), 3.0 - 0.6)
    # rotate sc2 to lie along x: endpoints at (3∓1, 0, 0)
    qy = quat_from_axis_angle(v(0, 1, 0), jnp.pi / 2)
    sc2 = Spherocylinder(v(3, 0, 0), qy, jnp.asarray(0.3), jnp.asarray(2.0))
    r = distance_spherocylinder_spherocylinder(sc1, sc2)
    assert np.isclose(float(r.dist), 2.0 - 0.6)


# ------------------------------------------------------------------- planes
def test_plane_pairs():
    pl = Plane(v(0, 0, 0), v(0, 0, 1))
    s = Sphere(v(0, 0, 3), jnp.asarray(1.0))
    r = distance_plane_sphere(pl, s)
    assert np.isclose(float(r.dist), 2.0)
    s_below = Sphere(v(0, 0, -3), jnp.asarray(1.0))
    assert np.isclose(float(distance_plane_sphere(pl, s_below).dist), -2.0)

    pl2 = Plane(v(0, 0, 5), v(0, 0, -1))
    assert np.isclose(float(distance_plane_plane(pl, pl2).dist), 5.0)
    pl3 = Plane(v(0, 0, 5), v(1, 0, 0))
    assert np.isclose(float(distance_plane_plane(pl, pl3).dist), 0.0)

    seg_above = LineSegment(v(0, 0, 1), v(0, 0, 2))
    assert np.isclose(float(distance_segment_plane(seg_above, pl).dist), 1.0)
    seg_cross = LineSegment(v(0, 0, -1), v(0, 0, 2))
    assert np.isclose(float(distance_segment_plane(seg_cross, pl).dist), 0.0)


# ---------------------------------------------------------------- ellipsoids
def test_point_ellipsoid_sphere_limit(rng):
    """Ellipsoid with equal radii must agree with the sphere formula."""
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 0), q, v(1.5, 1.5, 1.5))
    pts = jnp.asarray(rng.normal(size=(50, 3)) * 3)
    r = distance_point_ellipsoid(pts, jax.tree.map(lambda x: x[None], e))
    expect = np.linalg.norm(np.asarray(pts), axis=1) - 1.5
    np.testing.assert_allclose(np.asarray(r.dist), expect, atol=1e-7)


def test_point_ellipsoid_axis_points():
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 0), q, v(2.0, 1.0, 0.5))
    assert np.isclose(float(distance_point_ellipsoid(v(5, 0, 0), e).dist), 3.0, atol=1e-8)
    assert np.isclose(float(distance_point_ellipsoid(v(0, 5, 0), e).dist), 4.0, atol=1e-8)
    assert np.isclose(float(distance_point_ellipsoid(v(0, 0, 5), e).dist), 4.5, atol=1e-8)
    # inside
    assert float(distance_point_ellipsoid(v(0.1, 0.1, 0.0), e).dist) < 0


def test_point_ellipsoid_rotated():
    # rotate 90deg about z: body x-axis -> lab y-axis
    qz = quat_from_axis_angle(v(0, 0, 1), jnp.pi / 2)
    e = Ellipsoid(v(0, 0, 0), qz, v(2.0, 1.0, 0.5))
    assert np.isclose(float(distance_point_ellipsoid(v(0, 5, 0), e).dist), 3.0, atol=1e-8)


def test_sphere_ellipsoid():
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 0), q, v(2.0, 1.0, 1.0))
    s = Sphere(v(5, 0, 0), jnp.asarray(1.0))
    r = distance_sphere_ellipsoid(s, e)
    assert np.isclose(float(r.dist), 2.0, atol=1e-8)


def test_ellipsoid_ellipsoid_spheres_limit():
    q = quat_identity((), jnp.float64)
    e1 = Ellipsoid(v(0, 0, 0), q, v(1.0, 1.0, 1.0))
    e2 = Ellipsoid(v(3, 0, 0), q, v(0.5, 0.5, 0.5))
    r = distance_ellipsoid_ellipsoid(e1, e2)
    assert np.isclose(float(r.dist), 1.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.normal), [1, 0, 0], atol=1e-5)


def test_ellipsoid_ellipsoid_axis_aligned():
    q = quat_identity((), jnp.float64)
    e1 = Ellipsoid(v(0, 0, 0), q, v(2.0, 1.0, 1.0))
    e2 = Ellipsoid(v(5, 0, 0), q, v(2.0, 1.0, 1.0))
    r = distance_ellipsoid_ellipsoid(e1, e2)
    assert np.isclose(float(r.dist), 1.0, atol=1e-5)
    # overlapping -> negative
    e3 = Ellipsoid(v(3.0, 0, 0), q, v(2.0, 1.0, 1.0))
    r = distance_ellipsoid_ellipsoid(e1, e3)
    assert np.isclose(float(r.dist), -1.0, atol=1e-5)


def test_plane_ellipsoid_support():
    pl = Plane(v(0, 0, 0), v(0, 0, 1))
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 3), q, v(2.0, 1.0, 0.5))
    r = distance_plane_ellipsoid(pl, e)
    assert np.isclose(float(r.dist), 2.5, atol=1e-10)
    # rotate so long axis points along z: support = 2 -> dist = 1
    qy = quat_from_axis_angle(v(0, 1, 0), jnp.pi / 2)
    e = Ellipsoid(v(0, 0, 3), qy, v(2.0, 1.0, 0.5))
    r = distance_plane_ellipsoid(pl, e)
    assert np.isclose(float(r.dist), 1.0, atol=1e-10)


def test_segment_ellipsoid():
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 0), q, v(1.0, 1.0, 1.0))
    seg = LineSegment(v(-2, 0, 2), v(2, 0, 2))  # closest at (0,0,2)
    r = distance_segment_ellipsoid(seg, e)
    assert np.isclose(float(r.dist), 1.0, atol=1e-6)


# ----------------------------------------------------------------- circle3d
def test_circle3d_concentric_coplanar():
    q = quat_identity((), jnp.float64)
    c1 = Circle3D(v(0, 0, 0), q, jnp.asarray(2.0))
    c2 = Circle3D(v(0, 0, 0), q, jnp.asarray(5.0))
    r = distance_circle3d_circle3d(c1, c2)
    assert np.isclose(float(r.dist), 3.0, atol=1e-8)


def test_circle3d_offset():
    q = quat_identity((), jnp.float64)
    c1 = Circle3D(v(0, 0, 0), q, jnp.asarray(1.0))
    c2 = Circle3D(v(5, 0, 0), q, jnp.asarray(1.0))
    r = distance_circle3d_circle3d(c1, c2)
    assert np.isclose(float(r.dist), 3.0, atol=1e-8)


# ----------------------------------------------------------------- vsegment
def test_point_vsegment():
    vs = VSegment(v(-1, 0, 0), v(0, 0, 0), v(0, 1, 0))
    r = distance_point_vsegment(v(0.5, -0.5, 0), vs)
    # closest to first leg at (-? ) vs corner: corner (0,0,0) dist sqrt(0.5)
    assert np.isclose(float(r.dist), np.sqrt(0.5), atol=1e-12)


# --------------------------------------------------------------- periodicity
def test_periodic_sphere_sphere():
    m = periodic([10.0, 10.0, 10.0])
    s1 = Sphere(v(0.5, 5, 5), jnp.asarray(1.0))
    s2 = Sphere(v(9.5, 5, 5), jnp.asarray(1.0))
    r = distance_sphere_sphere(s1, s2, metric=m)
    assert np.isclose(float(r.dist), -1.0)  # min-image distance 1, radii 2
    np.testing.assert_allclose(r.normal, [-1, 0, 0], atol=1e-12)


def test_periodic_partial_axes():
    m = periodic([10.0, 10.0, 10.0], periodic_axes=(True, False, False))
    p1, p2 = v(0.5, 0.5, 0), v(9.5, 9.5, 0)
    r = distance_point_point(p1, p2, metric=m)
    # x wraps (-1), y does not (9)
    assert np.isclose(float(r.dist), np.sqrt(1 + 81))


def test_periodic_segment_segment():
    m = periodic([10.0, 10.0, 10.0])
    a = LineSegment(v(0.2, 0, 0), v(0.2, 1, 0))
    b = LineSegment(v(9.8, 0, 0), v(9.8, 1, 0))
    r = distance_segment_segment(a, b, metric=m)
    assert np.isclose(float(r.dist), 0.4, atol=1e-12)


def test_metric_wrap_and_sep():
    m = periodic([4.0, 4.0, 4.0])
    p = v(5.0, -1.0, 3.0)
    np.testing.assert_allclose(m.wrap(p), [1.0, 3.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(m.sep(v(0.5, 0, 0), v(3.5, 0, 0)), [-1, 0, 0], atol=1e-12)
    fm = free_space(jnp.float64)
    np.testing.assert_allclose(fm.sep(v(0.5, 0, 0), v(3.5, 0, 0)), [3, 0, 0], atol=1e-12)


# --------------------------------------------------------------------- batch
def test_batched_and_jitted(rng):
    n = 1000
    c1 = jnp.asarray(rng.normal(size=(n, 3)))
    c2 = jnp.asarray(rng.normal(size=(n, 3)))
    r1 = jnp.asarray(rng.uniform(0.1, 0.5, n))
    r2 = jnp.asarray(rng.uniform(0.1, 0.5, n))
    f = jax.jit(distance_sphere_sphere)
    out = f(Sphere(c1, r1), Sphere(c2, r2))
    expect = np.linalg.norm(np.asarray(c2 - c1), axis=1) - np.asarray(r1 + r2)
    np.testing.assert_allclose(np.asarray(out.dist), expect, atol=1e-12)


def test_ellipsoid_lbfgs_refine_sharpens_pgd():
    """The L-BFGS chart polish (math/lbfgs.py — the reference's own
    minimize.hpp pairing, EllipsoidEllipsoid.hpp:45-110) improves on the
    PGD answer on strongly anisotropic pairs, batched via vmap."""
    import numpy as np
    from mundy_tpu.geom.primitives import Ellipsoid
    from mundy_tpu.geom import random_unit_quaternions

    rng = np.random.default_rng(3)
    B = 16
    q1 = random_unit_quaternions(jax.random.PRNGKey(0), B, dtype=jnp.float64)
    q2 = random_unit_quaternions(jax.random.PRNGKey(1), B, dtype=jnp.float64)
    c1 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)))
    c2 = c1 + jnp.asarray(rng.uniform(1.5, 4.0, (B, 1))) * jnp.asarray(
        rng.normal(size=(B, 3)) / np.linalg.norm(rng.normal(size=(B, 3)),
                                                 axis=1, keepdims=True))
    radii = jnp.asarray(np.broadcast_to([2.2, 0.6, 0.25], (B, 3)))
    e1 = Ellipsoid(center=c1, radii=radii, orientation=q1)
    e2 = Ellipsoid(center=c2, radii=radii, orientation=q2)

    truth = distance_ellipsoid_ellipsoid(e1, e2, newton_iters=3000)
    coarse = distance_ellipsoid_ellipsoid(e1, e2, newton_iters=48)
    polished = distance_ellipsoid_ellipsoid(e1, e2, newton_iters=48,
                                            refine="lbfgs", refine_iters=20)
    err_c = np.abs(np.asarray(coarse.dist - truth.dist))
    err_p = np.abs(np.asarray(polished.dist - truth.dist))
    # on STRONG anisotropy (8.8:1 axes) the decaying-step PGD stalls at
    # O(0.1) errors — the curvature-aware polish is what makes the answer
    # correct (errors ~1e-12), exactly the reference's reason for running
    # L-BFGS in-kernel. It never loses (keeps the PGD answer unless the
    # objective improves); rare basin mismatches vs the 3000-iter truth
    # are the multistart's choice, not the polish's.
    assert err_p.max() <= err_c.max() + 1e-12
    assert (err_p < 1e-8).sum() >= B - 2, err_p
    assert np.median(err_p) < 1e-10
    assert np.median(err_c) > 1e-2  # PGD alone genuinely isn't enough here
