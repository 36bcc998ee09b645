"""Spectral Ewald (FFT wave-space) RPY vs the validated direct k-sum.

Mirrors the reference's planned PVFMM/STKFMM role (`TPLsList.cmake:29-30`):
the fast long-range Stokes path must agree with the direct lattice sum to
its construction tolerance, be splitting-parameter independent, and stay SPD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.geom import periodic
from mundy_tpu.mobility import (
    build_ewald_rpy,
    build_spectral_ewald,
    ewald_rpy_apply,
    se_rpy_apply,
    se_wave_apply,
)
from mundy_tpu.mobility.ewald import ewald_wave_apply
from mundy_tpu.neighbor import build_cell_list, make_cell_grid, neighbor_matrix

BOX, A, VISC = 10.0, 0.5, 1.0


@pytest.fixture
def system(rng):
    n = 160
    pos = jnp.asarray(rng.uniform(0, BOX, (n, 3)))
    F = jnp.asarray(rng.normal(size=(n, 3)))
    return pos, F


def _nmat(pos, r_cut):
    metric = periodic([BOX] * 3, dtype=jnp.float64)
    grid = make_cell_grid([0, 0, 0], [BOX] * 3, min(r_cut, BOX / 3),
                          (True,) * 3, jnp.float64)
    cl = build_cell_list(pos, grid, 64)
    return neighbor_matrix(pos, cl, jnp.asarray(0.5 * r_cut), metric=metric,
                           max_neighbors=128, chunk=256), metric


def test_wave_matches_direct_sum(system):
    pos, F = system
    op_d = build_ewald_rpy(BOX, A, VISC, tol=1e-6, dtype=jnp.float64)
    u_ref = ewald_wave_apply(op_d, pos, F)
    op_s = build_spectral_ewald(BOX, A, VISC, tol=1e-6, dtype=jnp.float64)
    u_se = se_wave_apply(op_s, pos, F)
    rel = float(jnp.linalg.norm(u_se - u_ref) / jnp.linalg.norm(u_ref))
    assert rel < 3e-6, rel


def test_full_operator_matches(system):
    pos, F = system
    op_d = build_ewald_rpy(BOX, A, VISC, tol=1e-6, dtype=jnp.float64)
    nm, metric = _nmat(pos, op_d.r_cut)
    u_ref = ewald_rpy_apply(op_d, pos, F, nm, metric)
    op_s = build_spectral_ewald(BOX, A, VISC, tol=1e-6, dtype=jnp.float64)
    u_se = se_rpy_apply(op_s, pos, F, nm, metric)
    rel = float(jnp.linalg.norm(u_se - u_ref) / jnp.linalg.norm(u_ref))
    assert rel < 3e-6, rel


def test_xi_independence(system):
    pos, F = system
    op1 = build_spectral_ewald(BOX, A, VISC, tol=1e-6, dtype=jnp.float64)
    op2 = build_spectral_ewald(BOX, A, VISC, xi=2.0 / (0.25 * BOX),
                               tol=1e-6, dtype=jnp.float64)
    nm1, metric = _nmat(pos, op1.base.r_cut)
    nm2, _ = _nmat(pos, op2.base.r_cut)
    u1 = se_rpy_apply(op1, pos, F, nm1, metric)
    u2 = se_rpy_apply(op2, pos, F, nm2, metric)
    rel = float(jnp.linalg.norm(u2 - u1) / jnp.linalg.norm(u1))
    assert rel < 5e-4, rel


def test_spd_and_symmetry(system):
    pos, F = system
    op_s = build_spectral_ewald(BOX, A, VISC, tol=1e-4, dtype=jnp.float64)
    nm, metric = _nmat(pos, op_s.base.r_cut)
    u = se_rpy_apply(op_s, pos, F, nm, metric)
    assert float(jnp.sum(F * u)) > 0
    # symmetry: <G, M F> == <F, M G>
    G = jnp.asarray(np.random.default_rng(7).normal(size=F.shape))
    uG = se_rpy_apply(op_s, pos, G, nm, metric)
    a = float(jnp.sum(G * u))
    b = float(jnp.sum(F * uG))
    assert abs(a - b) / max(abs(a), 1e-12) < 1e-4
