"""Rotne–Prager–Yamakawa hydrodynamic mobility (equal-radius spheres).

ref: `RPYKernel::operator()` (`scrap/lcp_spheres/StkNgpLCP.cpp:296-360`) and
`compute_mobility/techniques/RPYSpheres.hpp`. The reference evaluates, per
target-source pair (r = x_t - x_s, f = f_s, a = radius):

    u += 1/(8 pi mu) [ f/r + r (f.r)/r^3 + (2 a^2/3)(f/r^3 - 3 r (f.r)/r^5) ]

i.e. the far-field RPY tensor  M = 1/(8 pi mu r) [(I + rr) + (2a^2/3r^2)(I - 3rr)],
with the self term 1/(6 pi mu a) added separately and NO near-field
(overlapping) correction — we mirror that by default and offer the standard
regularized overlap branch (`overlap_correction=True`) which stays finite
as r -> 0 (Rotne & Prager 1969):

    r < 2a:  M = 1/(6 pi mu a) [ (1 - 9r/32a) I + (3/32a) r rr_hat ]

Two apply modes, both matrix-free:
- `rpy_apply_dense`: all-pairs O(N^2), blocked over targets (lax.map chunks)
  — the HYDRO_ALL path.
- `rpy_apply_neighbors`: neighbor-matrix restricted — the HYDRO_NEAREST path
  used inside the reference's BBPGD loop (`StkNgpLCP.cpp:727-737`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from mundy_tpu.geom.periodicity import Metric
from mundy_tpu.neighbor.cell_list import NeighborMatrix

_EPS = 1e-12


def rpy_self_mobility(forces: Array, radius, viscosity) -> Array:
    """Self term U = F / (6 pi mu a) (`StkNgpLCP.cpp:620-624`)."""
    return forces / (6.0 * math.pi * viscosity * radius)


def _rpy_pair_velocity(rvec: Array, f: Array, radius, viscosity,
                       overlap_correction: bool) -> Array:
    """Velocity contribution at the target from one source (batched over the
    trailing pair axes). rvec = x_target - x_source."""
    scale = 1.0 / (8.0 * math.pi * viscosity)
    a2_3 = radius * radius / 3.0

    r2 = jnp.sum(rvec * rvec, axis=-1)
    near_zero = r2 < _EPS
    rinv = jnp.where(near_zero, 0.0, jax.lax.rsqrt(jnp.maximum(r2, _EPS)))
    rinv3 = rinv * rinv * rinv
    rinv5 = rinv * rinv * rinv3
    fdotr = jnp.sum(f * rvec, axis=-1)

    c = f * rinv3[..., None] - (3.0 * fdotr * rinv5)[..., None] * rvec
    far = scale * (
        f * rinv[..., None]
        + (fdotr * rinv3)[..., None] * rvec
        + (2.0 * a2_3) * c
    )
    if not overlap_correction:
        return far

    r = r2 * rinv  # |r| (0 when near_zero)
    inv6 = 1.0 / (6.0 * math.pi * viscosity * radius)
    iso = (1.0 - 9.0 * r / (32.0 * radius))[..., None] * f
    rr = (3.0 / (32.0 * radius)) * fdotr * rinv
    near = inv6 * (iso + jnp.where(near_zero, 0.0, rr)[..., None] * rvec)
    return jnp.where((r < 2.0 * radius)[..., None], near, far)


def rpy_apply_dense(
    pos: Array,
    forces: Array,
    radius,
    viscosity,
    metric: Optional[Metric] = None,
    include_self: bool = True,
    overlap_correction: bool = False,
    chunk: int = 1024,
) -> Array:
    """U = M F over all pairs, blocked over targets. (N, 3).

    Mirrors apply_rpy_kernel + panelize (`StkNgpLCP.cpp:370-390`): the
    Kokkos team/panel decomposition becomes a lax.map over target chunks,
    each chunk evaluating against all sources in one vectorized sweep.
    """
    n = pos.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 3), pos.dtype)], axis=0)

    def one_chunk(start):
        tgt = jax.lax.dynamic_slice_in_dim(pos_p, start, chunk, axis=0)
        if metric is None:
            rvec = tgt[:, None, :] - pos[None, :, :]
        else:
            rvec = -metric.sep(tgt[:, None, :], pos[None, :, :])
        u = _rpy_pair_velocity(
            rvec, forces[None, :, :], radius, viscosity, overlap_correction
        )
        # s == t contributes zero via the rinv guard (and the near branch at
        # r=0 reduces to inv6 * f, which would double the self term — mask it)
        me = start + jnp.arange(chunk)
        same = me[:, None] == jnp.arange(n)[None, :]
        u = jnp.where(same[..., None], 0.0, u)
        return jnp.sum(u, axis=1)

    starts = jnp.arange(0, n_pad, chunk)
    u = jax.lax.map(one_chunk, starts).reshape(n_pad, 3)[:n]
    if include_self:
        u = u + rpy_self_mobility(forces, radius, viscosity)
    return u


def rpy_flow_at(
    targets: Array,
    pos: Array,
    forces: Array,
    radius,
    viscosity,
    chunk: int = 1024,
) -> Array:
    """Ambient RPY flow at off-particle field points (T, 3).

    u(x_t) = sum_b M_rpy(x_t - x_b) f_b with NO self term — the evaluation
    the periphery BIE needs at its quadrature nodes (the reference computes
    the ambient flow at surface nodes before `compute_surface_forces`,
    `HP1...neigh_linker.cpp:1487-1493`)."""
    t = targets.shape[0]
    t_pad = ((t + chunk - 1) // chunk) * chunk
    pad = t_pad - t
    tgt_p = jnp.concatenate([targets, jnp.zeros((pad, 3), targets.dtype)],
                            axis=0)

    def one_chunk(start):
        tgt = jax.lax.dynamic_slice_in_dim(tgt_p, start, chunk, axis=0)
        rvec = tgt[:, None, :] - pos[None, :, :]
        u = _rpy_pair_velocity(rvec, forces[None, :, :], radius, viscosity,
                               overlap_correction=True)
        return jnp.sum(u, axis=1)

    starts = jnp.arange(0, t_pad, chunk)
    return jax.lax.map(one_chunk, starts).reshape(t_pad, 3)[:t]


def rpy_apply_neighbors(
    pos: Array,
    forces: Array,
    nmat: NeighborMatrix,
    radius,
    viscosity,
    metric: Optional[Metric] = None,
    include_self: bool = True,
    overlap_correction: bool = False,
) -> Array:
    """U = M F restricted to the neighbor matrix (HYDRO_NEAREST,
    `apply_rpy_kernel_neighbors`). (N, 3)."""
    n = pos.shape[0]
    idx = jnp.minimum(nmat.idx, n - 1)
    pj = pos[idx]
    fj = forces[idx]
    if metric is None:
        rvec = pos[:, None, :] - pj
    else:
        rvec = -metric.sep(pos[:, None, :], pj)
    u = _rpy_pair_velocity(rvec, fj, radius, viscosity, overlap_correction)
    u = jnp.where(nmat.mask[..., None], u, 0.0)
    out = jnp.sum(u, axis=1)
    if include_self:
        out = out + rpy_self_mobility(forces, radius, viscosity)
    return out
