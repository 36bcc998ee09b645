"""Local (dry) Stokes drag mobility.

ref: `compute_the_mobility_problem` self-interaction term
(`StkNgpLCP.cpp:620-624`): U = F / (6 pi mu a); and the dry local-drag
technique (`compute_mobility/techniques/LocalDragNonOrientableSpheres`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array


def local_drag_mobility(forces: Array, radius, viscosity) -> Array:
    """U = F / (6 pi mu a). radius scalar or (N,)."""
    inv = 1.0 / (6.0 * math.pi * viscosity)
    r = jnp.asarray(radius)
    if r.ndim == 0:
        return (inv / r) * forces
    return (inv / r)[:, None] * forces


def local_drag_angular_mobility(torques: Array, radius, viscosity) -> Array:
    """Omega = T / (8 pi mu a^3)."""
    inv = 1.0 / (8.0 * math.pi * viscosity)
    r = jnp.asarray(radius)
    if r.ndim == 0:
        return (inv / r**3) * torques
    return (inv / r**3)[:, None] * torques
