"""Ewald-split periodic RPY: xi-independence, Hasimoto constant, limits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.geom import periodic
from mundy_tpu.mobility.ewald import build_ewald_rpy, ewald_rpy_apply
from mundy_tpu.neighbor import build_cell_list, make_cell_grid, neighbor_matrix


def full_nmat(n):
    """All-pairs neighbor matrix (small N test helper)."""
    from mundy_tpu.neighbor.cell_list import NeighborMatrix

    idx = jnp.asarray([[j for j in range(n) if j != i] for i in range(n)],
                      jnp.int32)
    return NeighborMatrix(idx=idx, mask=jnp.ones((n, n - 1), bool),
                          overflow=jnp.asarray(False))


def apply_op(op, pos, forces, box):
    metric = periodic([box] * 3, dtype=jnp.float64)
    return ewald_rpy_apply(op, pos, forces, full_nmat(pos.shape[0]), metric)


def test_xi_independence(rng):
    """The Ewald total must not depend on the splitting parameter."""
    box, a, eta = 10.0, 0.5, 1.3
    n = 12
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    f = jnp.asarray(rng.normal(size=(n, 3)))
    u1 = apply_op(build_ewald_rpy(box, a, eta, xi=0.8, tol=1e-8, dtype=jnp.float64),
                  pos, f, box)
    u2 = apply_op(build_ewald_rpy(box, a, eta, xi=1.4, tol=1e-8, dtype=jnp.float64),
                  pos, f, box)
    scale = float(jnp.max(jnp.abs(u1)))
    # tabulated-quadrature floor ~ 4e-5 relative (measured); the splitting
    # terms individually differ at O(1)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               atol=2e-4 * scale)


def test_hasimoto_sedimentation():
    """Single sphere per cubic cell driven by F: the periodic mobility is
    mu(L) = (1 - 2.83730 a/L + 4.19 (a/L)^3 - ...) / (6 pi eta a)
    (Hasimoto 1959). Checked to the leading correction."""
    a, eta = 0.3, 1.0
    for box in (8.0, 12.0):
        op = build_ewald_rpy(box, a, eta, tol=1e-8, dtype=jnp.float64)
        pos = jnp.asarray([[0.5 * box] * 3])
        f = jnp.asarray([[1.0, 0.0, 0.0]])
        # single particle: no real-space pairs
        from mundy_tpu.neighbor.cell_list import NeighborMatrix

        nm = NeighborMatrix(idx=jnp.full((1, 1), 1, jnp.int32),
                            mask=jnp.zeros((1, 1), bool),
                            overflow=jnp.asarray(False))
        metric = periodic([box] * 3, dtype=jnp.float64)
        u = ewald_rpy_apply(op, pos, f, nm, metric)
        mu = float(u[0, 0])
        mu0 = 1.0 / (6 * np.pi * eta * a)
        expect = mu0 * (1 - 2.83730 * a / box + 4.19 * (a / box) ** 3)
        assert np.isclose(mu, expect, rtol=2e-3), (box, mu / mu0, expect / mu0)
        # transverse components vanish by symmetry
        assert abs(float(u[0, 1])) < 1e-10 * mu


def test_large_box_matches_free_space(rng):
    """L >> r: periodic RPY approaches the free-space pair mobility."""
    from mundy_tpu.mobility import rpy_apply_dense

    a, eta, box = 0.4, 1.0, 60.0
    pos = jnp.asarray([[28.0, 30.0, 30.0], [33.0, 30.0, 30.0]])  # r = 5
    # force-free pair: the k=0 backflow (periodic sedimentation physics,
    # O(F_net/(eta L))) cancels, isolating the pair coupling
    f1 = rng.normal(size=3)
    f = jnp.asarray(np.stack([f1, -f1]))
    op = build_ewald_rpy(box, a, eta, tol=1e-8, dtype=jnp.float64)
    u_per = apply_op(op, pos, f, box)
    u_free = rpy_apply_dense(pos, f, a, eta, chunk=2, overlap_correction=True)
    scale = float(jnp.max(jnp.abs(u_free)))
    # remaining periodic image corrections ~ (r/L)^3
    np.testing.assert_allclose(np.asarray(u_per), np.asarray(u_free),
                               atol=0.02 * scale)


def test_symmetry_and_spd(rng):
    """Periodic mobility must be symmetric positive definite."""
    box, a, eta = 9.0, 0.45, 1.0
    n = 8
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    op = build_ewald_rpy(box, a, eta, tol=1e-7, dtype=jnp.float64)
    metric = periodic([box] * 3, dtype=jnp.float64)
    nm = full_nmat(n)

    M = np.zeros((3 * n, 3 * n))
    for col in range(3 * n):
        e = np.zeros((n, 3))
        e[col // 3, col % 3] = 1.0
        M[:, col] = np.asarray(
            ewald_rpy_apply(op, pos, jnp.asarray(e), nm, metric)).ravel()
    np.testing.assert_allclose(M, M.T, atol=1e-9 * np.abs(M).max())
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0
