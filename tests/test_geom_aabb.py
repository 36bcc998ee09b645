"""AABB / bounding radius / transform / randomize."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.geom import (
    Ellipsoid,
    LineSegment,
    Sphere,
    Spherocylinder,
    SpherocylinderSegment,
    aabb_inflate,
    aabb_union,
    compute_aabb_ellipsoid,
    compute_aabb_scsegment,
    compute_aabb_segment,
    compute_aabb_sphere,
    compute_aabb_spherocylinder,
    compute_bounding_radius_ellipsoid,
    compute_bounding_radius_sphere,
    compute_bounding_radius_spherocylinder,
    random_points_in_box,
    random_unit_quaternions,
    transform_points,
    inverse_transform_points,
)
from mundy_tpu.math.quaternion import quat_from_axis_angle, quat_identity


def v(*xs):
    return jnp.asarray(xs, dtype=jnp.float64)


def test_aabb_sphere():
    box = compute_aabb_sphere(Sphere(v(1, 2, 3), jnp.asarray(0.5)))
    np.testing.assert_allclose(box.min, [0.5, 1.5, 2.5])
    np.testing.assert_allclose(box.max, [1.5, 2.5, 3.5])


def test_aabb_segment_and_capsule():
    seg = LineSegment(v(1, 0, 0), v(0, 1, 0))
    box = compute_aabb_segment(seg)
    np.testing.assert_allclose(box.min, [0, 0, 0])
    np.testing.assert_allclose(box.max, [1, 1, 0])

    sc = SpherocylinderSegment(v(1, 0, 0), v(0, 1, 0), jnp.asarray(0.25))
    box = compute_aabb_scsegment(sc)
    np.testing.assert_allclose(box.min, [-0.25, -0.25, -0.25])
    np.testing.assert_allclose(box.max, [1.25, 1.25, 0.25])


def test_aabb_spherocylinder_oriented():
    qy = quat_from_axis_angle(v(0, 1, 0), jnp.pi / 2)  # z-axis -> x-axis
    sc = Spherocylinder(v(0, 0, 0), qy, jnp.asarray(0.5), jnp.asarray(4.0))
    box = compute_aabb_spherocylinder(sc)
    np.testing.assert_allclose(box.min, [-2.5, -0.5, -0.5], atol=1e-12)
    np.testing.assert_allclose(box.max, [2.5, 0.5, 0.5], atol=1e-12)


def test_aabb_ellipsoid_tight():
    q = quat_identity((), jnp.float64)
    e = Ellipsoid(v(0, 0, 0), q, v(2.0, 1.0, 0.5))
    box = compute_aabb_ellipsoid(e)
    np.testing.assert_allclose(box.max, [2.0, 1.0, 0.5], atol=1e-12)
    # rotated 90deg about z: x and y extents swap
    qz = quat_from_axis_angle(v(0, 0, 1), jnp.pi / 2)
    box = compute_aabb_ellipsoid(Ellipsoid(v(0, 0, 0), qz, v(2.0, 1.0, 0.5)))
    np.testing.assert_allclose(box.max, [1.0, 2.0, 0.5], atol=1e-12)


def test_aabb_ellipsoid_encloses_samples(rng):
    """Tight AABB must contain every surface sample (and not by much)."""
    q = jnp.asarray(rng.normal(size=4))
    q = q / jnp.linalg.norm(q)
    e = Ellipsoid(v(0.5, -1, 2), q, v(2.0, 1.0, 0.5))
    box = compute_aabb_ellipsoid(e)
    th = rng.uniform(0, np.pi, 2000)
    ph = rng.uniform(0, 2 * np.pi, 2000)
    pts_body = np.stack(
        [2.0 * np.sin(th) * np.cos(ph), 1.0 * np.sin(th) * np.sin(ph), 0.5 * np.cos(th)],
        axis=1,
    )
    from mundy_tpu.math.quaternion import quat_rotate

    pts = np.asarray(quat_rotate(q, jnp.asarray(pts_body))) + np.array([0.5, -1, 2])
    assert (pts >= np.asarray(box.min) - 1e-9).all()
    assert (pts <= np.asarray(box.max) + 1e-9).all()
    # tight within 1e-3 on each face
    assert np.abs(pts.max(axis=0) - np.asarray(box.max)).max() < 5e-3


def test_bounding_radii():
    assert float(compute_bounding_radius_sphere(Sphere(v(0, 0, 0), jnp.asarray(2.0)))) == 2.0
    q = quat_identity((), jnp.float64)
    sc = Spherocylinder(v(0, 0, 0), q, jnp.asarray(0.5), jnp.asarray(4.0))
    assert float(compute_bounding_radius_spherocylinder(sc)) == 2.5
    e = Ellipsoid(v(0, 0, 0), q, v(2.0, 1.0, 0.5))
    assert float(compute_bounding_radius_ellipsoid(e)) == 2.0


def test_union_inflate():
    a = compute_aabb_sphere(Sphere(v(0, 0, 0), jnp.asarray(1.0)))
    b = compute_aabb_sphere(Sphere(v(5, 0, 0), jnp.asarray(1.0)))
    u = aabb_union(a, b)
    np.testing.assert_allclose(u.min, [-1, -1, -1])
    np.testing.assert_allclose(u.max, [6, 1, 1])
    infl = aabb_inflate(a, 0.5)
    np.testing.assert_allclose(infl.min, [-1.5, -1.5, -1.5])


def test_transform_round_trip(rng):
    q = jnp.asarray(rng.normal(size=4))
    q = q / jnp.linalg.norm(q)
    t = v(1, -2, 3)
    p = jnp.asarray(rng.normal(size=(20, 3)))
    out = inverse_transform_points(q, t, transform_points(q, t, p))
    np.testing.assert_allclose(out, p, atol=1e-12)


def test_randomize():
    key = jax.random.PRNGKey(0)
    pts = random_points_in_box(key, 1000, [0, 0, 0], [2, 4, 8], dtype=jnp.float64)
    assert pts.shape == (1000, 3)
    assert float(pts.min()) >= 0.0
    assert (np.asarray(pts.max(axis=0)) <= [2, 4, 8]).all()
    qs = random_unit_quaternions(key, 500, dtype=jnp.float64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qs), axis=1), 1.0, atol=1e-12)
