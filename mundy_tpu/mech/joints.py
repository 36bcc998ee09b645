"""Joint elements.

ref: `mundy/mech/src/mundy_mech/primitives/BallJoint.hpp` — a ball joint
pins a point of one body to a point of another. In the overdamped SoA world
it is a stiff attachment spring between the two (body-frame) attachment
points with zero rest length (penalty formulation; the reference stores the
same data: two bodies + attachment offsets + stiffness).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

from mundy_tpu.math.quaternion import quat_rotate


def ball_joint_forces(
    pos: Array,  # (N, 3) body centers
    quat: Array,  # (N, 4) body orientations
    body_a: Array,  # (J,) int32
    body_b: Array,  # (J,)
    offset_a: Array,  # (J, 3) body-frame attachment on A
    offset_b: Array,  # (J, 3) body-frame attachment on B
    stiffness,  # scalar or (J,)
    mask: Optional[Array] = None,
):
    """(forces (N,3), torques (N,3)) from penalty ball joints."""
    ra = quat_rotate(quat[body_a], offset_a)
    rb = quat_rotate(quat[body_b], offset_b)
    pa = pos[body_a] + ra
    pb = pos[body_b] + rb
    k = jnp.broadcast_to(jnp.asarray(stiffness, pos.dtype), body_a.shape)
    if mask is not None:
        k = jnp.where(mask, k, 0.0)
    f_on_a = (k[..., None]) * (pb - pa)  # pull A toward B

    n = pos.shape[0]
    forces = jnp.zeros_like(pos)
    forces = forces.at[body_a].add(f_on_a)
    forces = forces.at[body_b].add(-f_on_a)
    torques = jnp.zeros_like(pos)
    torques = torques.at[body_a].add(jnp.cross(ra, f_on_a))
    torques = torques.at[body_b].add(jnp.cross(rb, -f_on_a))
    return forces, torques
