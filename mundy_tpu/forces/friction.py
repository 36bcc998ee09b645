"""Frictional Hertzian contact (granular DEM, history-dependent).

Replaces the reference's FrictionalHertzianContact kernels
(`SpherocylinderSegmentSpherocylinderSegmentFrictionalHertzianContact.cpp:
440-520`, LAMMPS granular hertz/history convention): spring-dashpot normal
force, tangential spring on the accumulated (projected) tangential
displacement, Coulomb cap |Ft| <= mu |Fn| with the reference's history
rescaling.

The per-contact tangential displacement is the history variable; it lives in
the pair-list slot (capacity-padded) and is carried across steps by the
caller. On neighbor rebuild the slot mapping changes and history restarts —
same practical behavior as a DEM rebuild without history matching; pass the
old state through `match_history` if slot-stable warm starts are needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from mundy_tpu.geom.periodicity import Metric
from mundy_tpu.neighbor.cell_list import PairList

_EPS = 1e-12


class FrictionalContactResult(NamedTuple):
    forces: Array  # (N, 3) per body
    torques: Array  # (N, 3) per body (from tangential forces at contact)
    tang_disp: Array  # (C, 3) updated history
    normal_force_mag: Array  # (C,) diagnostics


def frictional_hertzian_contact(
    pos: Array,  # (N, 3) body centers (spheres; capsules via contact points)
    vel: Array,  # (N, 3) body velocities (for dashpots)
    radius: Array,  # scalar or (N,)
    pairs: PairList,
    tang_disp: Array,  # (C, 3) tangential history per pair slot
    dt,
    normal_spring: float,
    normal_damping: float,
    tang_spring: float,
    tang_damping: float,
    friction_coeff: float,
    density: float = 1.0,
    metric: Optional[Metric] = None,
) -> FrictionalContactResult:
    """Sphere-sphere frictional Hertzian over a pair list.

    Force on the LEFT body i (reference convention): normal spring-dashpot
    hertz_poly * (k_n * sep * n + m_eff * c_n * v_n) plus tangential
    hertz_poly * (k_t * xi + m_eff * c_t * v_t), Coulomb-capped; equal and
    opposite on j; torques from the tangential component at the contact
    point.
    """
    n = pos.shape[0]
    radius = jnp.broadcast_to(jnp.asarray(radius, pos.dtype), (n,))
    i, j = pairs.i, pairs.j
    pi, pj = pos[i], pos[j]
    sepv = (pj - pi) if metric is None else metric.sep(pi, pj)
    r2 = jnp.maximum(jnp.sum(sepv * sepv, axis=-1), _EPS)
    rinv = jax.lax.rsqrt(r2)
    dist = r2 * rinv
    nhat = sepv * rinv[:, None]  # from i toward j (the left contact normal)
    ri, rj = radius[i], radius[j]
    signed_sep = dist - ri - rj
    in_contact = pairs.mask & (signed_sep < 0.0)

    # contact-point velocities (spheres: center velocity + 0 spin here)
    rel = vel[j] - vel[i]
    rel_n = jnp.sum(rel * nhat, axis=-1)[:, None] * nhat
    rel_t = rel - rel_n

    # history update: accumulate and project to the tangent plane; reset
    # out-of-contact slots (ref `:432-434` reset on separation)
    xi = tang_disp + rel_t * dt
    xi = xi - jnp.sum(xi * nhat, axis=-1)[:, None] * nhat
    xi = jnp.where(in_contact[:, None], xi, 0.0)

    m = (4.0 / 3.0) * jnp.pi * density * radius**3
    m_eff = (m[i] * m[j]) / (m[i] + m[j])
    r_eff = (ri * rj) / (ri + rj)
    hertz_poly = jnp.sqrt(jnp.maximum(-r_eff * signed_sep, 0.0))

    f_n = hertz_poly[:, None] * (
        normal_spring * signed_sep[:, None] * nhat
        + (m_eff * normal_damping)[:, None] * rel_n
    )
    f_t = hertz_poly[:, None] * (
        tang_spring * xi + (m_eff * tang_damping)[:, None] * rel_t
    )

    # Coulomb cap with history rescale (ref `:497-513`)
    fn_mag = jnp.linalg.norm(f_n, axis=-1)
    ft_mag = jnp.linalg.norm(f_t, axis=-1)
    cap = friction_coeff * fn_mag
    over = ft_mag > cap
    scale = cap / jnp.maximum(ft_mag, _EPS)
    damp_term = (m_eff * tang_damping)[:, None] * rel_t / jnp.maximum(tang_spring, _EPS)
    xi_rescaled = scale[:, None] * (xi + damp_term) - damp_term
    xi = jnp.where(over[:, None], xi_rescaled, xi)
    f_t = jnp.where(over[:, None], f_t * scale[:, None], f_t)

    f_on_i = jnp.where(in_contact[:, None], f_n + f_t, 0.0)
    forces = jnp.zeros_like(pos)
    forces = forces.at[i].add(f_on_i)
    forces = forces.at[j].add(-f_on_i)

    # torques: tangential force acts at the contact point on each surface
    arm_i = (ri * jnp.ones_like(ri))[:, None] * nhat
    arm_j = -(rj)[:, None] * nhat
    ti = jnp.cross(arm_i, f_on_i)
    tj = jnp.cross(arm_j, -f_on_i)
    torques = jnp.zeros_like(pos)
    torques = torques.at[i].add(ti)
    torques = torques.at[j].add(tj)
    return FrictionalContactResult(
        forces=forces, torques=torques, tang_disp=xi,
        normal_force_mag=jnp.where(in_contact, jnp.linalg.norm(f_n, axis=-1), 0.0),
    )
