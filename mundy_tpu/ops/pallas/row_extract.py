"""Pallas TPU kernel: K-nearest neighbor extraction on the row layout.

The XLA row broad phase (neighbor/rows.neighbor_matrix_rows) runs K
argmin-extraction passes, each re-materializing the (R, 9R) candidate
blocks through HBM plus take_along gathers — ~1.0 s at 1M bodies, the
dominant cost of an LCP rebuild. This kernel performs the whole extraction
in VMEM: one HBM read of the candidate planes, K select-reduce passes over
the resident pair blocks, one write of (ids, count).

Tie-breaking without argmin: squared distances are bitcast to int32 (order
preserving for non-negative floats), the low 10 mantissa bits are replaced
by the candidate lane index (unique — 9R < 1024 lanes), and the minimum is
taken over ints. Equality against the min then selects EXACTLY one lane,
and the gid extraction is a select-sum (no gathers — Mosaic has none).

Output ids are laid out (ny, nz, K, R) — K on the sublane axis — so the
VMEM output block stays ~1 MB instead of padding K=8..16 lanes to 128; the
caller transposes to the (..., K) neighbor-matrix convention in XLA.

ref: the coarse_search + linker generation pipeline this replaces,
`mundy/mesh/src/mundy_mesh/GenNeighborLinkers.hpp:510-663`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_INF = 0x7F7FFFFF  # bits of f32 max — beyond any real r2 (python int:
# jnp scalars would be captured as traced constants, which pallas rejects)


def _extract_kernel(lx, ly, lz, cut2, y_thresh, K, cz, ny, nz, R,
                    pxm, pym, pzm, gm,   # y-1 plane (1, nz, R) + gid
                    pxc, pyc, pzc, gc,   # y   plane
                    pxp, pyp, pzp, gp,   # y+1 plane
                    ids_ref,             # out (1, nz, K, R) int32 gids (pad -1)
                    cnt_ref,             # out (1, nz, R) int32 hit count
                    scx, scy, scz, scg):  # VMEM scratch (nz, 9R) f32/f32/f32/i32
    i = pl.program_id(0)
    f32 = jnp.float32

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, R), 0)
    zsh_p = jnp.where(zrow == nz - 1, f32(lz), f32(0.0))
    zsh_m = jnp.where(zrow == 0, f32(-lz), f32(0.0))
    ysh_m = jnp.where(i == 0, f32(-ly), f32(0.0))       # y-1 wraps at plane 0
    ysh_p = jnp.where(i == ny - 1, f32(ly), f32(0.0))   # y+1 wraps at plane ny-1

    # concatenated 9-offset candidate planes: (dy, dz) major order
    planes = ((pxm, pym, pzm, gm, ysh_m), (pxc, pyc, pzc, gc, f32(0.0)),
              (pxp, pyp, pzp, gp, ysh_p))
    seg = 0
    for px_r, py_r, pz_r, g_r, ysh in planes:
        x0, y0, z0, g0 = px_r[0], py_r[0] + ysh, pz_r[0], g_r[0]
        for dz in (-1, 0, 1):
            sl = slice(seg * R, (seg + 1) * R)
            if dz == 0:
                scx[:, sl] = x0
                scy[:, sl] = y0
                scz[:, sl] = z0
                scg[:, sl] = g0
            else:
                sh = (-dz) % nz
                scx[:, sl] = pltpu.roll(x0, sh, axis=0)
                scy[:, sl] = pltpu.roll(y0, sh, axis=0)
                scz[:, sl] = pltpu.roll(z0, sh, axis=0) + (zsh_p if dz == 1 else zsh_m)
                scg[:, sl] = pltpu.roll(g0, sh, axis=0)
            seg += 1

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, R, 9 * R), 2)
    own_lane = 4 * R + jax.lax.broadcasted_iota(jnp.int32, (1, R, 9 * R), 1)
    not_self = lanes != own_lane
    inv_lx = 1.0 / lx

    def zbody(c, _):
        zs = pl.ds(c * cz, cz)
        ox = pxc[0, zs]
        oy = pyc[0, zs]
        oz = pzc[0, zs]
        dx = scx[zs][:, None, :] - ox[:, :, None]        # (cz, R, 9R)
        dx = dx - lx * jnp.round(dx * inv_lx)
        dy = scy[zs][:, None, :] - oy[:, :, None]
        dz = scz[zs][:, None, :] - oz[:, :, None]
        # candidate sentinel filter; own sentinels need none (they sit 1e6
        # boxes from every real candidate, and sentinel-sentinel pairs have
        # an invalid candidate side)
        cv = scy[zs][:, None, :] > y_thresh
        r2 = dx * dx + dy * dy + dz * dz
        hit = (r2 < cut2) & not_self & cv
        cnt_ref[0, zs] = jnp.sum(hit.astype(jnp.int32), axis=2)

        # int-packed keys: low 10 bits = lane id (9R < 1024) for unique ties
        bits = jax.lax.bitcast_convert_type(r2, jnp.int32)
        key = jnp.where(hit, (bits & ~1023) | lanes, _INT_INF)
        cg1 = scg[zs][:, None, :] + 1
        for k in range(K):
            m = jnp.min(key, axis=2)
            sel = key == m[:, :, None]
            found = m < _INT_INF
            gid_k = jnp.sum(jnp.where(sel, cg1, 0), axis=2) - 1
            ids_ref[0, zs, k, :] = jnp.where(found, gid_k, -1)
            key = jnp.where(sel, _INT_INF, key)
        return ()

    jax.lax.fori_loop(0, nz // cz, zbody, (), unroll=False)


def row_neighbor_extract(
    pos: Array,   # (ny, nz, R, 3) f32 from build_rows (sentinel slots)
    gid: Array,   # (ny, nz, R) int32
    box,          # (3,) lengths
    cutoff: float,
    max_neighbors: int,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """K nearest in-cutoff neighbor gids per row slot, plus hit counts.

    Returns (ids (ny, nz, R, K) int32 gids with -1 padding sorted by
    distance, count (ny, nz, R) int32 — count > K means truncation and the
    caller must flag overflow). Requires ny, nz >= 5 and nz % 8 == 0
    (make_row_grid(..., align=8)).
    """
    ny, nz, R, _ = pos.shape
    K = max_neighbors
    if ny < 5 or nz < 5:
        raise ValueError("row_neighbor_extract needs ny, nz >= 5")
    if nz % 8 != 0:
        raise ValueError("row_neighbor_extract needs nz % 8 == 0: build the "
                         "grid with make_row_grid(..., align=8)")
    px = pos[..., 0].astype(jnp.float32)
    py = pos[..., 1].astype(jnp.float32)
    pz = pos[..., 2].astype(jnp.float32)
    g = gid.astype(jnp.int32)

    # ~6 live (cz, R, 9R) int/f32 blocks in the extraction loop, ~7 MB budget
    budget = 7e6
    cz = 8
    for c in range(nz, 7, -8):
        if nz % c == 0 and 6 * c * R * 9 * R * 4 <= budget:
            cz = c
            break

    kern = functools.partial(
        _extract_kernel,
        float(box[0]), float(box[1]), float(box[2]),
        float(cutoff) ** 2, float(-2.0 * box[1] - 4.0),
        K, cz, ny, nz, R,
    )

    def spec(off):
        return pl.BlockSpec((1, nz, R), lambda i, o=off: ((i + o) % ny, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = []
    inputs = []
    for off in (-1, 0, 1):
        in_specs += [spec(off)] * 4
        inputs += [px, py, pz, g]

    ids, cnt = pl.pallas_call(
        kern,
        grid=(ny,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, nz, K, R), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ny, nz, K, R), jnp.int32),
            jax.ShapeDtypeStruct((ny, nz, R), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nz, 9 * R), jnp.float32),
            pltpu.VMEM((nz, 9 * R), jnp.float32),
            pltpu.VMEM((nz, 9 * R), jnp.float32),
            pltpu.VMEM((nz, 9 * R), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    return jnp.transpose(ids, (0, 1, 3, 2)), cnt
