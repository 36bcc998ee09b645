"""Pallas K-neighbor extraction kernel vs brute force.

Runs in interpreter mode on CPU (compiled mode is exercised on real TPU by
the bench). Covers the full-row small-R path, reduced z-chunks at moderate
R, lane-id fields wider than 10 bits (9R >= 1024, hit at the clustered-
chromatin scale R ~ 136), very large R at small nz (the fixed VMEM costs
scale with nz, so a long-x box supports R > 200), and the scoped-VMEM
model's rejection of shapes past the ceiling (callers then take the XLA
extraction path).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.neighbor.rows import build_rows, make_row_grid
from mundy_tpu.ops.pallas.row_extract import row_neighbor_extract


def _brute_sets(pos, box, cutoff):
    p = np.asarray(pos, np.float64)
    b = np.asarray(box, np.float64)
    d = p[:, None, :] - p[None, :, :]
    d -= b * np.round(d / b)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    hits = r2 < cutoff * cutoff
    return [set(np.nonzero(hits[i])[0].tolist()) for i in range(len(p))]


def _run(n, box, cutoff, K, seed=7):
    box3 = np.broadcast_to(np.asarray(box, np.float64), (3,))
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * box3, jnp.float32)
    grid = make_row_grid([0, 0, 0], box3, cutoff, n,
                         dtype=jnp.float32, align=8)
    assert grid.nz % 8 == 0
    state = build_rows(pos, jnp.arange(n, dtype=jnp.int32), grid)
    ids, cnt = row_neighbor_extract(state.pos, state.gid, tuple(box3),
                                    cutoff, K, interpret=True)
    ids = np.asarray(ids)
    cnt = np.asarray(cnt)
    gid = np.asarray(state.gid)
    valid = np.asarray(state.valid)
    want = _brute_sets(pos, box3, cutoff)
    checked = 0
    for iy in range(grid.ny):
        for iz in range(grid.nz):
            for r in range(grid.row_capacity):
                if not valid[iy, iz, r]:
                    continue
                g = gid[iy, iz, r]
                got = set(int(v) for v in ids[iy, iz, r] if v >= 0)
                assert cnt[iy, iz, r] == len(want[g]), (g, cnt[iy, iz, r])
                assert cnt[iy, iz, r] <= K, "test sized K below max count"
                assert got == want[g], (g, got, want[g])
                checked += 1
    assert checked == n
    return grid.row_capacity


def test_extract_full_rows():
    # small occupancy: R <= 63, single-chunk cz=8+ (historical) path
    R = _run(n=3000, box=20.0, cutoff=1.0, K=24)
    assert R <= 63


def test_extract_dense_rows():
    # tight box -> 8x8 row grid with dense rows (R > 63)
    R = _run(n=2400, box=8.0, cutoff=1.0, K=48)
    assert R > 63


def test_extract_wide_lane_bits():
    # R >= 114 -> 9R >= 1024 -> lane-id field wider than 10 bits
    R = _run(n=3900, box=8.0, cutoff=1.0, K=80, seed=11)
    assert 9 * R >= 1024


def test_extract_large_R_small_nz():
    # long-x box: R counts beads per full-x (y,z) column, so a long thin
    # box drives R past 200 while the LOCAL density — and hence K — stays
    # small; at nz=8 the fixed VMEM costs are small enough that this fits
    R = _run(n=7000, box=(60.0, 8.0, 8.0), cutoff=1.0, K=24, seed=5)
    assert R > 180


def test_extract_rejects_oversize_rows():
    from mundy_tpu.ops.pallas.row_extract import row_extract_vmem_ok

    # chromatin-scale grid (nz=64) with a row capacity past the scoped-VMEM
    # ceiling: the model refuses and the caller takes the XLA path
    assert not row_extract_vmem_ok(64, 200, 58)
    pos = jnp.zeros((64, 64, 200, 3), jnp.float32)
    gid = jnp.zeros((64, 64, 200), jnp.int32)
    with pytest.raises(ValueError, match="VMEM"):
        row_neighbor_extract(pos, gid, (64.0,) * 3, 1.0, 58, interpret=True)
    # the verified-on-TPU operating points stay inside the model
    assert row_extract_vmem_ok(24, 152, 40)   # clustered 40k parity run
    assert row_extract_vmem_ok(64, 88, 12)    # 1M spheres LCP broad phase
