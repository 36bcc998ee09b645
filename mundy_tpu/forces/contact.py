"""Pairwise contact forces over the dense neighbor matrix.

Replaces the reference's per-shape-pair EvaluateLinkerPotentials kernels
(Hertzian: `SphereSphereHertzianContact.cpp:188-215`, WCA and frictional
variants in the same directory) and the LinkerPotentialForceReduction
scatter: each particle accumulates its own force over its neighbor row
(one-sided sum), so no atomics and bitwise-deterministic results.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from mundy_tpu.geom.periodicity import Metric
from mundy_tpu.neighbor.cell_list import NeighborMatrix

_EPS = 1e-12


def hertzian_pair_force(
    sep: Array, r_eff: Array, e_eff: Array
) -> Array:
    """Hertz normal force magnitude F = 4/3 E* sqrt(R*) delta^{3/2}.

    `sep` is the signed surface separation (negative = overlap, delta = -sep).
    ref: SphereSphereHertzianContact.cpp:205-210.
    """
    delta = jnp.maximum(-sep, 0.0)
    return (4.0 / 3.0) * e_eff * jnp.sqrt(r_eff) * delta * jnp.sqrt(delta)


def wca_pair_force(r: Array, sigma: Array, epsilon: Array) -> Array:
    """WCA (shifted-truncated LJ) force magnitude along the center line,
    positive = repulsive; zero beyond the 2^(1/6) sigma cutoff.

    ref: the WCA kernels in evaluate_linker_potentials (FENEWCASprings.hpp).
    """
    cutoff = (2.0 ** (1.0 / 6.0)) * sigma
    r_safe = jnp.maximum(r, 1e-6 * sigma)
    sr6 = (sigma / r_safe) ** 6
    f = 24.0 * epsilon * (2.0 * sr6 * sr6 - sr6) / r_safe
    return jnp.where(r < cutoff, f, 0.0)


def effective_radius(r1: Array, r2: Array) -> Array:
    return (r1 * r2) / (r1 + r2)


def effective_youngs(e1: Array, e2: Array, nu1: Array, nu2: Array) -> Array:
    """ref: SphereSphereHertzianContact.cpp:199-202."""
    return (e1 * e2) / (e2 - e2 * nu1 * nu1 + e1 - e1 * nu2 * nu2)


def contact_forces(
    pos: Array,
    radius: Array,
    nmat: NeighborMatrix,
    pair_force_mag: Callable[[Array, Array, Array], Array],
    metric: Optional[Metric] = None,
) -> Array:
    """Generic central-force accumulation over the neighbor matrix.

    pair_force_mag(signed_sep, idx_i, idx_j) -> magnitude (positive =
    repulsive along the i->j normal). Returns (N, 3) forces.
    """
    n = pos.shape[0]
    idx = jnp.minimum(nmat.idx, n - 1)  # clamp padding
    pj = pos[idx]  # (N, K, 3)
    if metric is None:
        sepv = pj - pos[:, None, :]
    else:
        sepv = metric.sep(pos[:, None, :], pj)
    d = jnp.sqrt(jnp.maximum(jnp.sum(sepv * sepv, axis=-1), _EPS * _EPS))
    nhat = sepv / d[..., None]
    signed_sep = d - radius[:, None] - radius[idx]
    mag = pair_force_mag(signed_sep, jnp.arange(n)[:, None], idx)
    mag = jnp.where(nmat.mask, mag, 0.0)
    # repulsive: force on i points away from j
    return -jnp.sum(mag[..., None] * nhat, axis=1)


def hertzian_contact_forces(
    pos: Array,
    radius: Array,
    youngs: Array,
    poisson: Array,
    nmat: NeighborMatrix,
    metric: Optional[Metric] = None,
) -> Array:
    """Hertzian sphere-sphere contact over the neighbor matrix. (N,3)."""
    radius = jnp.broadcast_to(radius, pos.shape[:1])
    youngs = jnp.broadcast_to(youngs, pos.shape[:1])
    poisson = jnp.broadcast_to(poisson, pos.shape[:1])

    def mag(signed_sep, i, j):
        r_eff = effective_radius(radius[i], radius[j])
        e_eff = effective_youngs(youngs[i], youngs[j], poisson[i], poisson[j])
        return hertzian_pair_force(signed_sep, r_eff, e_eff)

    return contact_forces(pos, radius, nmat, mag, metric)


def wca_contact_forces(
    pos: Array,
    radius: Array,
    epsilon: Array,
    nmat: NeighborMatrix,
    metric: Optional[Metric] = None,
) -> Array:
    """WCA contact with sigma = r_i + r_j (contact at center distance sigma)."""
    radius = jnp.broadcast_to(radius, pos.shape[:1])
    epsilon = jnp.broadcast_to(epsilon, pos.shape[:1])

    def mag(signed_sep, i, j):
        sigma = radius[i] + radius[j]
        r = signed_sep + sigma  # center-center distance
        eps_pair = jnp.sqrt(epsilon[i] * epsilon[j])
        return wca_pair_force(r, sigma, eps_pair)

    return contact_forces(pos, radius, nmat, mag, metric)
