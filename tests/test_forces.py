"""Contact and spring forces vs analytic values."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.forces import (
    angular_spring_forces,
    fene_spring_forces,
    hertzian_contact_forces,
    hertzian_pair_force,
    hookean_spring_forces,
    wca_contact_forces,
    wca_pair_force,
)
from mundy_tpu.neighbor import NeighborMatrix, build_cell_list, make_cell_grid, neighbor_matrix


def two_sphere_nmat():
    """Hand-built neighbor matrix for a 2-particle system."""
    idx = jnp.asarray([[1, 2], [0, 2]], jnp.int32)
    mask = jnp.asarray([[True, False], [True, False]])
    return NeighborMatrix(idx=idx, mask=mask, overflow=jnp.asarray(False))


def test_hertzian_two_spheres_analytic():
    # radius 1 spheres at distance 1.5: overlap delta = 0.5
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]])
    r = jnp.asarray([1.0, 1.0])
    E = jnp.asarray([1e3, 1e3])
    nu = jnp.asarray([0.3, 0.3])
    f = hertzian_contact_forces(pos, r, E, nu, two_sphere_nmat())
    e_eff = (1e3 * 1e3) / (1e3 * (1 - 0.09) + 1e3 * (1 - 0.09))
    expect = (4.0 / 3.0) * e_eff * np.sqrt(0.5) * 0.5**1.5
    np.testing.assert_allclose(f[0], [-expect, 0, 0], rtol=1e-12)
    np.testing.assert_allclose(f[1], [expect, 0, 0], rtol=1e-12)
    # Newton's third law by construction
    np.testing.assert_allclose(f.sum(axis=0), np.zeros(3), atol=1e-12)


def test_hertzian_no_force_when_separated():
    pos = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]])
    f = hertzian_contact_forces(pos, jnp.ones(2), jnp.full(2, 1e3), jnp.full(2, 0.3),
                                two_sphere_nmat())
    np.testing.assert_allclose(f, np.zeros((2, 3)), atol=1e-14)


def test_hertzian_pair_force_scaling():
    # F ~ delta^{3/2}
    f1 = float(hertzian_pair_force(jnp.asarray(-0.1), jnp.asarray(0.5), jnp.asarray(100.0)))
    f2 = float(hertzian_pair_force(jnp.asarray(-0.4), jnp.asarray(0.5), jnp.asarray(100.0)))
    assert np.isclose(f2 / f1, 4.0**1.5)


def test_wca_cutoff_and_repulsion():
    sigma = jnp.asarray(1.0)
    eps = jnp.asarray(2.0)
    # beyond cutoff: zero
    assert float(wca_pair_force(jnp.asarray(1.2), sigma, eps)) == 0.0
    # at sigma: F = 24 eps (2 - 1) / sigma = 24*2
    np.testing.assert_allclose(float(wca_pair_force(sigma, sigma, eps)), 48.0, rtol=1e-12)
    # repulsive below sigma
    assert float(wca_pair_force(jnp.asarray(0.9), sigma, eps)) > 0


def test_wca_contact_forces_pairwise():
    pos = jnp.asarray([[0.0, 0, 0], [0.9, 0, 0]])
    f = wca_contact_forces(pos, jnp.full(2, 0.5), jnp.full(2, 1.0), two_sphere_nmat())
    assert f[0, 0] < 0 and f[1, 0] > 0
    np.testing.assert_allclose(f.sum(axis=0), np.zeros(3), atol=1e-12)


def test_hookean_spring_analytic():
    pos = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
    i = jnp.asarray([0], jnp.int32)
    j = jnp.asarray([1], jnp.int32)
    f = hookean_spring_forces(pos, i, j, jnp.asarray([10.0]), jnp.asarray([1.5]))
    # stretched by 0.5 -> force 5 pulling together
    np.testing.assert_allclose(f[0], [5.0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(f[1], [-5.0, 0, 0], atol=1e-12)


def test_fene_spring_divergence():
    pos = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    i, j = jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32)
    k, rmax = jnp.asarray([30.0]), jnp.asarray([1.5])
    f = fene_spring_forces(pos, i, j, k, rmax)
    expect = 30.0 * 1.0 / (1.0 - (1.0 / 1.5) ** 2)
    np.testing.assert_allclose(f[0], [expect, 0, 0], rtol=1e-12)
    # near rmax the clamp keeps it finite
    pos2 = jnp.asarray([[0.0, 0, 0], [1.499999, 0, 0]])
    f2 = fene_spring_forces(pos2, i, j, k, rmax)
    assert np.isfinite(np.asarray(f2)).all()


def test_angular_spring_straight_chain():
    # three nodes at rest angle pi (straight): zero force
    pos = jnp.asarray([[-1.0, 0, 0], [1.0, 0, 0], [0.0, 0, 0]])
    i, j, apex = (jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
                  jnp.asarray([2], jnp.int32))
    f = angular_spring_forces(pos, i, j, apex, jnp.asarray([5.0]), jnp.asarray([np.pi]))
    np.testing.assert_allclose(f, np.zeros((3, 3)), atol=1e-12)

    # bent chain: forces push back toward straight, total force = 0
    pos = jnp.asarray([[-1.0, 0.2, 0], [1.0, 0.2, 0], [0.0, 0, 0]])
    f = angular_spring_forces(pos, i, j, apex, jnp.asarray([5.0]), jnp.asarray([np.pi]))
    np.testing.assert_allclose(np.asarray(f).sum(axis=0), np.zeros(3), atol=1e-12)
    assert not np.allclose(np.asarray(f), 0.0)
    # angular spring torque should reduce the bend: end nodes pushed outward (down)
    assert f[0, 1] < 0 and f[1, 1] < 0


def test_forces_through_cell_list(rng):
    """End-to-end: cell list -> neighbor matrix -> Hertzian forces conserve
    momentum and match a brute-force double loop."""
    n = 100
    box = np.array([5.0, 5.0, 5.0])
    pos_np = rng.uniform(0, 1, (n, 3)) * box
    pos = jnp.asarray(pos_np)
    r = 0.4
    grid = make_cell_grid([0, 0, 0], box, 2 * r, dtype=jnp.float64)
    clist = build_cell_list(pos, grid, cell_capacity=32)
    nmat = neighbor_matrix(pos, clist, jnp.full(n, r), max_neighbors=32, chunk=32)
    f = hertzian_contact_forces(pos, jnp.full(n, r), jnp.full(n, 100.0),
                                jnp.full(n, 0.3), nmat)
    np.testing.assert_allclose(np.asarray(f).sum(axis=0), np.zeros(3), atol=1e-9)

    # brute force reference
    e_eff = (100.0 * 100.0) / (100.0 * (1 - 0.09) * 2)
    r_eff = r / 2
    f_ref = np.zeros((n, 3))
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            d = pos_np[b] - pos_np[a]
            dist = np.linalg.norm(d)
            sep = dist - 2 * r
            if sep < 0:
                mag = (4 / 3) * e_eff * np.sqrt(r_eff) * (-sep) ** 1.5
                f_ref[a] -= mag * d / dist
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=1e-9)


def test_fenewca_chain_matches_bond_list(rng):
    """The scatter-free chain kernel equals the generic bond-list kernel
    bit-for-bit on the contiguous-chain layout."""
    from mundy_tpu.forces import fenewca_chain_forces, fenewca_spring_forces

    chains, per = 3, 17
    n = chains * per
    pos = jnp.asarray(rng.uniform(0, 8.0, (n, 3)))
    left = np.arange(n - 1)
    ok = (left + 1) % per != 0
    bi = jnp.asarray(left[ok], jnp.int32)
    bj = jnp.asarray(left[ok] + 1, jnp.int32)
    k, rmax, sigma, eps = 30.0, 1.5, 1.0, 1.0
    ref = fenewca_spring_forces(pos, bi, bj, k, rmax, sigma, eps)
    got = fenewca_chain_forces(pos, per, k, rmax, sigma, eps)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    from mundy_tpu.geom import periodic
    m = periodic(np.array([8.0] * 3), dtype=jnp.float64)
    ref = fenewca_spring_forces(pos, bi, bj, k, rmax, sigma, eps, metric=m)
    got = fenewca_chain_forces(pos, per, k, rmax, sigma, eps, metric=m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
