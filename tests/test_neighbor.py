"""Cell-list neighbor search vs O(N^2) brute force.

Mirrors reference UnitTestGenNeighborLinks intent: the broad phase must find
exactly the pairs within the search radii, with self/connected exclusions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.geom import periodic
from mundy_tpu.neighbor import (
    build_cell_list,
    build_pair_list,
    make_cell_grid,
    need_rebuild,
    neighbor_matrix,
)


def brute_pairs(pos, radii, box=None):
    n = len(pos)
    pairs = set()
    for i in range(n):
        for j in range(i + 1, n):
            d = pos[i] - pos[j]
            if box is not None:
                d = d - box * np.round(d / box)
            if np.linalg.norm(d) <= radii[i] + radii[j]:
                pairs.add((i, j))
    return pairs


def nmat_pairs(nmat):
    pairs = set()
    idx = np.asarray(nmat.idx)
    mask = np.asarray(nmat.mask)
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                j = int(idx[i, k])
                pairs.add((min(i, j), max(i, j)))
    return pairs


@pytest.mark.parametrize("use_periodic", [False, True])
def test_matches_brute_force(rng, use_periodic):
    n = 300
    box = np.array([10.0, 8.0, 12.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    radii = rng.uniform(0.2, 0.5, n)

    metric = periodic(box) if use_periodic else None
    grid = make_cell_grid([0, 0, 0], box, min_cell_size=1.0,
                          periodic=(use_periodic,) * 3, dtype=jnp.float64)
    clist = build_cell_list(jnp.asarray(pos), grid, cell_capacity=16)
    assert not bool(clist.overflow)
    nmat = neighbor_matrix(jnp.asarray(pos), clist, jnp.asarray(radii),
                           metric=metric, max_neighbors=32, chunk=128)
    assert not bool(nmat.overflow)

    expect = brute_pairs(pos, radii, box if use_periodic else None)
    got = nmat_pairs(nmat)
    assert got == expect

    # each pair appears in BOTH rows (symmetric neighbor matrix)
    idx, mask = np.asarray(nmat.idx), np.asarray(nmat.mask)
    for (i, j) in expect:
        assert j in idx[i][mask[i]]
        assert i in idx[j][mask[j]]


def test_pair_list_compaction(rng):
    n = 200
    box = np.array([6.0, 6.0, 6.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    radii = np.full(n, 0.4)
    grid = make_cell_grid([0, 0, 0], box, 0.8, periodic=(True,) * 3, dtype=jnp.float64)
    clist = build_cell_list(jnp.asarray(pos), grid, cell_capacity=16)
    nmat = neighbor_matrix(jnp.asarray(pos), clist, jnp.asarray(radii),
                           metric=periodic(box), max_neighbors=32, chunk=64)
    plist = build_pair_list(nmat, capacity=4096)
    assert not bool(plist.overflow)

    expect = brute_pairs(pos, radii, box)
    got = {
        (int(i), int(j))
        for i, j, m in zip(np.asarray(plist.i), np.asarray(plist.j), np.asarray(plist.mask))
        if m
    }
    assert got == expect
    assert int(plist.num_pairs) == len(expect)


def test_pair_list_overflow_flag(rng):
    n = 64
    pos = rng.uniform(0, 1, (n, 3))  # dense cluster, everyone neighbors
    grid = make_cell_grid([0, 0, 0], [1, 1, 1], 1.0, dtype=jnp.float64)
    clist = build_cell_list(jnp.asarray(pos), grid, cell_capacity=64)
    nmat = neighbor_matrix(jnp.asarray(pos), clist, jnp.full(n, 2.0),
                           max_neighbors=64, chunk=64)
    plist = build_pair_list(nmat, capacity=10)
    assert bool(plist.overflow)
    assert int(plist.num_pairs) == n * (n - 1) // 2


def test_cell_capacity_overflow(rng):
    pos = jnp.zeros((20, 3)) + 0.5  # all in one cell
    grid = make_cell_grid([0, 0, 0], [1, 1, 1], 1.0, dtype=jnp.float64)
    clist = build_cell_list(pos, grid, cell_capacity=8)
    assert bool(clist.overflow)


def test_exclusion_filter(rng):
    """ExcludeConnectedEntities analog: bonded neighbors dropped."""
    pos = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [5.0, 0, 0]])
    radii = jnp.asarray([1.0, 1.0, 1.0])
    grid = make_cell_grid([-1, -1, -1], [7, 1, 1], 2.0, dtype=jnp.float64)
    clist = build_cell_list(pos, grid, cell_capacity=8)
    exclude = jnp.asarray([[1], [0], [-1]], jnp.int32)  # 0-1 bonded
    nmat = neighbor_matrix(pos, clist, radii, max_neighbors=8, chunk=4,
                           exclude=exclude)
    assert nmat_pairs(nmat) == set()  # 0-1 excluded; 2 is isolated


def test_need_rebuild():
    pos0 = jnp.zeros((10, 3))
    pos1 = pos0.at[3].set(jnp.asarray([0.3, 0.0, 0.0]))
    assert not bool(need_rebuild(pos1, pos0, skin=1.0))
    assert bool(need_rebuild(pos1, pos0, skin=0.5))


def test_jit_build(rng):
    n = 500
    box = np.array([10.0, 10.0, 10.0])
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * box)
    grid = make_cell_grid([0, 0, 0], box, 1.0, periodic=(True,) * 3, dtype=jnp.float64)

    @jax.jit
    def build(p):
        cl = build_cell_list(p, grid, cell_capacity=16)
        nm = neighbor_matrix(p, cl, jnp.full(n, 0.5), metric=periodic(box),
                             max_neighbors=32, chunk=128)
        return build_pair_list(nm, capacity=8192)

    p1 = build(pos)
    p2 = build(pos + 0.0)
    assert int(p1.num_pairs) == int(p2.num_pairs)


def test_neighbor_matrix_query_matches_full(rng):
    """The subset-query rows equal the matching rows of the full build —
    the distributed-search invariant sharded rebuilds rely on."""
    from mundy_tpu.neighbor import (build_cell_list, make_cell_grid,
                                    neighbor_matrix, neighbor_matrix_query)

    n = 400
    pos = jnp.asarray(rng.uniform(0, 12.0, (n, 3)))
    grid = make_cell_grid([0, 0, 0], np.array([12.0] * 3), 1.5,
                          (False,) * 3, jnp.float64)
    clist = build_cell_list(pos, grid, 32)
    sr = jnp.asarray(0.75)
    full = neighbor_matrix(pos, clist, sr, max_neighbors=24, chunk=128)
    sel = jnp.asarray(np.sort(rng.choice(n, 150, replace=False)).astype(np.int32))
    sub = neighbor_matrix_query(pos, clist, pos[sel], sel, sr,
                                max_neighbors=24, chunk=64)
    np.testing.assert_array_equal(np.asarray(sub.idx),
                                  np.asarray(full.idx[sel]))
    np.testing.assert_array_equal(np.asarray(sub.mask),
                                  np.asarray(full.mask[sel]))
    assert bool(sub.overflow) == False

    # exclusion tables work per query row
    excl = jnp.asarray(np.stack([np.asarray(full.idx[sel])[:, 0],
                                 np.full(150, -1)], axis=1).astype(np.int32))
    sub2 = neighbor_matrix_query(pos, clist, pos[sel], sel, sr,
                                 max_neighbors=24, chunk=64, exclude=excl)
    first = np.asarray(full.idx[sel])[:, 0]
    has = np.asarray(full.mask[sel])[:, 0]
    bad = (np.asarray(sub2.idx) == first[:, None]) & np.asarray(sub2.mask) \
        & has[:, None]
    assert not bad.any()
