"""Free-space spectral Stokes (mobility/freespace.py) vs dense RPY.

The confined-domain PVFMM analog: the operator must match the dense
free-space RPY product to the builder tolerance on random confined
configs (VERDICT r2 missing #3 acceptance bar: 1e-4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.mobility.freespace import (build_freespace_stokes,
                                          freespace_rpy_apply,
                                          freespace_wave_apply)
from mundy_tpu.mobility.rpy import rpy_apply_dense
from mundy_tpu.neighbor import build_cell_list, make_cell_grid, neighbor_matrix


def _confined_cloud(rng, n, r_sphere, radius):
    """Non-overlapping beads inside a sphere of radius r_sphere."""
    pts = []
    while len(pts) < n:
        p = rng.uniform(-r_sphere, r_sphere, 3)
        if np.linalg.norm(p) > r_sphere - radius:
            continue
        if pts and np.min(np.linalg.norm(np.asarray(pts) - p, axis=1)) < 2.2 * radius:
            continue
        pts.append(p)
    return np.asarray(pts)


def _nmat_for(op, pos, domain, origin):
    r_cut = op.se.base.r_cut
    grid = make_cell_grid(origin, np.array([domain] * 3), max(r_cut, 1.0),
                          (False,) * 3, jnp.float64)
    clist = build_cell_list(pos, grid, 64)
    return neighbor_matrix(pos, clist, jnp.asarray(0.5 * r_cut, jnp.float64),
                           max_neighbors=96, chunk=256)


@pytest.mark.parametrize("tol", [1e-3, 1e-4])
def test_freespace_matches_dense_rpy(rng, tol):
    n = 72
    radius, visc = 0.5, 1.3
    r_sphere = 5.0
    pos = jnp.asarray(_confined_cloud(rng, n, r_sphere, radius))
    f = jnp.asarray(rng.normal(size=(n, 3)))

    domain = 2.0 * r_sphere
    origin = (-r_sphere, -r_sphere, -r_sphere)
    op = build_freespace_stokes(domain, radius, visc, origin=origin,
                                extent=2.0 * r_sphere, tol=tol,
                                n_particles=n, dtype=jnp.float64)
    nmat = _nmat_for(op, pos, domain, origin)
    assert not bool(nmat.overflow)

    u, _ovf = freespace_rpy_apply(op, pos, f, nmat)
    u_ref = rpy_apply_dense(pos, f, radius, visc, include_self=True)
    err = float(jnp.max(jnp.abs(u - u_ref)) / jnp.max(jnp.abs(u_ref)))
    assert err < 5.0 * tol, err


def test_freespace_no_periodic_images(rng):
    """Two beads near opposite domain faces: a periodic operator would see
    a short image distance; free space must reproduce the TRUE long-range
    1/r interaction."""
    radius, visc = 0.4, 1.0
    domain = 12.0
    pos = jnp.asarray([[0.7, 6.0, 6.0], [11.3, 6.0, 6.0]], jnp.float64)
    f = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float64)
    op = build_freespace_stokes(domain, radius, visc, origin=(0.0, 0.0, 0.0),
                                tol=1e-4, n_particles=2, dtype=jnp.float64)
    nmat = _nmat_for(op, pos, domain, (0.0, 0.0, 0.0))
    u, _ovf = freespace_rpy_apply(op, pos, f, nmat)
    u_ref = rpy_apply_dense(pos, f, radius, visc, include_self=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=3e-4 * float(jnp.max(jnp.abs(u_ref))))
    # the cross-mobility is the 10.6-separation Oseen level, NOT the
    # 1.4-separation image level a periodic sum would produce
    r = 10.6
    oseen = 1.0 / (8.0 * math.pi * visc * r) * 2.0  # longitudinal: 2/(8 pi eta r)
    assert abs(float(u[1, 0]) - oseen) < 0.2 * oseen


def test_freespace_symmetric_and_decaying(rng):
    """M is symmetric (reciprocal theorem) and the far-field velocity
    decays ~ 1/r."""
    radius, visc = 0.5, 1.0
    domain = 16.0
    op = build_freespace_stokes(domain, radius, visc, origin=(0.0, 0.0, 0.0),
                                tol=1e-3, n_particles=3, dtype=jnp.float64)
    pos = jnp.asarray([[3.0, 8.0, 8.0], [7.0, 8.0, 8.0], [13.0, 8.0, 8.0]],
                      jnp.float64)
    nmat = _nmat_for(op, pos, domain, (0.0, 0.0, 0.0))

    def apply(fv):
        return freespace_rpy_apply(op, pos, jnp.asarray(fv, jnp.float64),
                                   nmat)[0]

    e = np.zeros((3, 3))
    m = np.zeros((9, 9))
    for j in range(9):
        fv = np.zeros((3, 3))
        fv[j // 3, j % 3] = 1.0
        m[:, j] = np.asarray(apply(fv)).ravel()
    np.testing.assert_allclose(m, m.T, atol=1e-6 * np.abs(m).max())
    # u at bead 2 from a force on bead 0 (10 apart) is weaker than at
    # bead 1 (4 apart), ~ 1/r
    f0 = np.zeros((3, 3))
    f0[0, 0] = 1.0
    u = np.asarray(apply(f0))
    assert abs(u[2, 0]) < 0.55 * abs(u[1, 0])
