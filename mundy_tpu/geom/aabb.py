"""AABB and bounding-radius computation per primitive.

Replaces the reference's `compute_aabb` overloads
(`mundy/geom/src/mundy_geom/compute_aabb.hpp:48-131`) and
`compute_bounding_radius.hpp`, plus the archived ComputeAABB meta-kernels
(`scrap/parameter_interface/shapes/src/mundy_shapes/ComputeAABB.hpp:49`).
All functions are batched; AABBs feed the cell-list broad phase.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mundy_tpu.geom.primitives import (
    AABB,
    Ellipsoid,
    LineSegment,
    Sphere,
    Spherocylinder,
    SpherocylinderSegment,
    spherocylinder_endpoints,
)
from mundy_tpu.math.quaternion import quat_to_matrix


def compute_aabb_point(p: Array) -> AABB:
    return AABB(min=p, max=p)


def compute_aabb_sphere(s: Sphere) -> AABB:
    r = s.radius[..., None]
    return AABB(min=s.center - r, max=s.center + r)


def compute_aabb_segment(seg: LineSegment) -> AABB:
    return AABB(min=jnp.minimum(seg.start, seg.end), max=jnp.maximum(seg.start, seg.end))


def compute_aabb_scsegment(sc: SpherocylinderSegment) -> AABB:
    r = sc.radius[..., None]
    return AABB(
        min=jnp.minimum(sc.start, sc.end) - r,
        max=jnp.maximum(sc.start, sc.end) + r,
    )


def compute_aabb_spherocylinder(sc: Spherocylinder) -> AABB:
    return compute_aabb_scsegment(spherocylinder_endpoints(sc))


def compute_aabb_ellipsoid(e: Ellipsoid) -> AABB:
    """Tight AABB of a rotated ellipsoid: half-extent_k = ||diag(r) R^T e_k||
    = sqrt(sum_i (R_ki r_i)^2)."""
    R = quat_to_matrix(e.orientation)
    half = jnp.sqrt(jnp.sum((R * e.radii[..., None, :]) ** 2, axis=-1))
    return AABB(min=e.center - half, max=e.center + half)


def compute_bounding_radius_sphere(s: Sphere) -> Array:
    return s.radius


def compute_bounding_radius_spherocylinder(sc: Spherocylinder) -> Array:
    return 0.5 * sc.length + sc.radius


def compute_bounding_radius_ellipsoid(e: Ellipsoid) -> Array:
    return jnp.max(e.radii, axis=-1)


def aabb_union(a: AABB, b: AABB) -> AABB:
    return AABB(min=jnp.minimum(a.min, b.min), max=jnp.maximum(a.max, b.max))


def aabb_inflate(a: AABB, margin) -> AABB:
    """Grow by a skin margin (the neighbor-list search buffer,
    ref GenNeighborLinkers search-sphere inflation)."""
    m = jnp.asarray(margin)[..., None] if jnp.ndim(margin) else margin
    return AABB(min=a.min - m, max=a.max + m)


# ---------------------------------------------------------------------------
# Oriented bounding boxes (ref: scrap/.../shapes/compute_obb/kernels/)
# ---------------------------------------------------------------------------
def compute_obb_sphere(s: Sphere):
    """OBB of a sphere: identity orientation, cubic half-extents.
    Returns (center (...,3), orientation quaternion (...,4), half_extents (...,3))."""
    from mundy_tpu.math.quaternion import quat_identity

    q = jnp.zeros(s.center.shape[:-1] + (4,), s.center.dtype).at[..., 0].set(1.0)
    half = jnp.broadcast_to(s.radius[..., None], s.center.shape)
    return s.center, q, half


def compute_obb_spherocylinder(sc: Spherocylinder):
    """OBB aligned with the capsule axis: half-extents (r, r, L/2 + r)."""
    half = jnp.stack(
        [sc.radius, sc.radius, 0.5 * sc.length + sc.radius], axis=-1
    )
    return sc.center, sc.orientation, half


def compute_obb_ellipsoid(e: Ellipsoid):
    """OBB aligned with the body axes: half-extents = the radii."""
    return e.center, e.orientation, e.radii
