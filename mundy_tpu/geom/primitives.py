"""Geometric primitives as structure-of-arrays pytrees.

Replaces the reference's 11 ownership-templated primitives
(`mundy/geom/src/mundy_geom/primitives/*.hpp`): `Point, Line, LineSegment,
VSegment, Ring, Sphere, Spherocylinder, SpherocylinderSegment, Circle3D,
Ellipsoid, AABB` (Point is a bare `(..., 3)` array here). Each dataclass field
carries leading batch axes, so one `Sphere` value represents N spheres; the
reference's Owns-vs-Views distinction disappears because JAX arrays are
immutable views by nature.

Conventions:
- orientations are unit quaternions, wxyz (see math.quaternion)
- a spherocylinder's axis is its body-frame z-axis rotated by `orientation`
  (the cylinder spans center ± length/2 * axis, capped by hemispheres)
- a plane is (point, unit normal); a Circle3D is the rim of radius `radius`
  in the body xy-plane; a Ring is a torus: Circle3D rim + tube `minor_radius`
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mundy_tpu.core.containers import pytree_dataclass
from mundy_tpu.math.quaternion import quat_rotate


@pytree_dataclass
class Sphere:
    """ref: primitives/Sphere.hpp:41"""

    center: Array  # (..., 3)
    radius: Array  # (...)


@pytree_dataclass
class Line:
    """Infinite line through `point` with unit `direction`. ref: primitives/Line.hpp"""

    point: Array  # (..., 3)
    direction: Array  # (..., 3) unit


@pytree_dataclass
class LineSegment:
    """ref: primitives/LineSegment.hpp"""

    start: Array  # (..., 3)
    end: Array  # (..., 3)


@pytree_dataclass
class VSegment:
    """Two joined segments start–middle–end. ref: primitives/VSegment.hpp:278-280"""

    start: Array  # (..., 3)
    middle: Array  # (..., 3)
    end: Array  # (..., 3)


@pytree_dataclass
class Plane:
    """Infinite plane (point, unit normal). ref: distance/{Line,Point,...}Plane.hpp"""

    point: Array  # (..., 3)
    normal: Array  # (..., 3) unit


@pytree_dataclass
class Circle3D:
    """Circle rim in 3D: body-frame xy-plane circle of `radius`.
    ref: primitives/Circle3D.hpp:45"""

    center: Array  # (..., 3)
    orientation: Array  # (..., 4) wxyz
    radius: Array  # (...)


@pytree_dataclass
class Ring:
    """Torus: Circle3D center-circle (major_radius) + tube (minor_radius).
    ref: primitives/Ring.hpp:46"""

    center: Array  # (..., 3)
    orientation: Array  # (..., 4)
    major_radius: Array  # (...)
    minor_radius: Array  # (...)


@pytree_dataclass
class Spherocylinder:
    """Capsule by center/orientation/radius/length. ref: primitives/Spherocylinder.hpp:43"""

    center: Array  # (..., 3)
    orientation: Array  # (..., 4)
    radius: Array  # (...)
    length: Array  # (...) cylindrical length (between cap centers)


@pytree_dataclass
class SpherocylinderSegment:
    """Capsule by explicit endpoints (the narrow-phase-friendly form).
    ref: primitives/SpherocylinderSegment.hpp"""

    start: Array  # (..., 3)
    end: Array  # (..., 3)
    radius: Array  # (...)


@pytree_dataclass
class Ellipsoid:
    """Triaxial ellipsoid: body-frame semi-axes radii=(r1,r2,r3).
    ref: primitives/Ellipsoid.hpp"""

    center: Array  # (..., 3)
    orientation: Array  # (..., 4)
    radii: Array  # (..., 3)


@pytree_dataclass
class AABB:
    """Axis-aligned bounding box. ref: primitives/AABB.hpp:438"""

    min: Array  # (..., 3)
    max: Array  # (..., 3)


def spherocylinder_endpoints(sc: Spherocylinder) -> SpherocylinderSegment:
    """Convert center/orientation form to endpoint form (body z-axis)."""
    zhat = jnp.zeros_like(sc.center).at[..., 2].set(1.0)
    axis = quat_rotate(sc.orientation, zhat)
    half = 0.5 * sc.length[..., None] * axis
    return SpherocylinderSegment(
        start=sc.center - half, end=sc.center + half, radius=sc.radius
    )
