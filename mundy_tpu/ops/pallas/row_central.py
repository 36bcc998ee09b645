"""Pallas TPU kernel: half-stencil central pair forces on the row layout.

The XLA row hot path (neighbor/rows.pair_accumulate_central) evaluates the
full 9-row stencil: every off-row pair is computed twice (once from each
side) because XLA can only fuse a single-axis reduction — asking for the
Newton's-third-law partner sum as well (pair_accumulate_central_sym) forces
the (R, 5R) W*D blocks to materialize in HBM and is a net LOSS (measured
18.9 vs 27.8 steps/s at 1M bodies on v5e).

This kernel computes each off-row pair ONCE and accumulates BOTH reductions
in VMEM while the pair block is live in registers:

- own force  f_i += w * D      (reduce over the candidate lane axis)
- partner    f_j -= w * D      (reduce over the own sublane axis)

Candidate set per y-plane program: the 5-block half stencil
  [self | own z+1 | (y+1) z-1 | (y+1) z | (y+1) z+1]
concatenated along lanes into a (nz, 5R) VMEM scratch (one ~448-lane tile
row instead of five 128-padded ones; R=88 would waste 45% of each separate
block). The other 4 neighbor rows arrive as inverse-rolled partner sums:
the in-plane (0,+1) partner is rolled back and merged inside the kernel;
the three (y+1) partners are returned as separate arrays that the caller
rolls by (+1, dz) and adds — O(N) XLA data movement.

Arithmetic contract matches pair_accumulate_central exactly (sentinel
invalid slots separate themselves -> no validity masks; candidate y/z
pre-shifted to the nearest periodic image -> only x needs a per-pair
one-component minimum image). ref: the BASELINE "100k/1M spheres" configs,
`scrap/lcp_spheres/StkNgpLCP.cpp` pair pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sym_kernel(lx, ly, lz, two_r, r_eff, e_eff, cz, ny, nz, R,
                oxr, oyr, ozr,      # own plane (1, nz, R)
                pxr, pyr, pzr,      # (y+1) % ny plane (1, nz, R)
                fxo, fyo, fzo,      # own-force outputs (1, nz, R)
                pxm, pym, pzm,      # partner out, (y+1, z-1): (1, nz, R)
                px0, py0, pz0,      # partner out, (y+1, z  )
                pxp, pyp, pzp,      # partner out, (y+1, z+1)
                scx, scy, scz,      # VMEM scratch (nz, 5R) candidate planes
                acx, acy, acz):     # VMEM scratch (nz, 4R) partner sums
    i = pl.program_id(0)
    f32 = jnp.float32

    # --- build the concatenated candidate planes ---------------------------
    # z-image shift vectors: rolled row j holds orig (j+dz) % nz, so the
    # wrapped rows live one box away in z.
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, R), 0)
    zsh_p = jnp.where(zrow == nz - 1, f32(lz), f32(0.0))   # dz = +1
    zsh_m = jnp.where(zrow == 0, f32(-lz), f32(0.0))       # dz = -1
    # y-image shift: program ny-1 reads plane 0, one box away in y.
    ysh = jnp.where(i == ny - 1, f32(ly), f32(0.0))

    ox0, oy0, oz0 = oxr[0], oyr[0], ozr[0]
    pxn, pyn, pzn = pxr[0], pyr[0] + ysh, pzr[0]

    scx[:, 0:R] = ox0
    scy[:, 0:R] = oy0
    scz[:, 0:R] = oz0
    scx[:, R:2 * R] = pltpu.roll(ox0, nz - 1, axis=0)
    scy[:, R:2 * R] = pltpu.roll(oy0, nz - 1, axis=0)
    scz[:, R:2 * R] = pltpu.roll(oz0, nz - 1, axis=0) + zsh_p
    scx[:, 2 * R:3 * R] = pltpu.roll(pxn, 1, axis=0)
    scy[:, 2 * R:3 * R] = pltpu.roll(pyn, 1, axis=0)
    scz[:, 2 * R:3 * R] = pltpu.roll(pzn, 1, axis=0) + zsh_m
    scx[:, 3 * R:4 * R] = pxn
    scy[:, 3 * R:4 * R] = pyn
    scz[:, 3 * R:4 * R] = pzn
    scx[:, 4 * R:5 * R] = pltpu.roll(pxn, nz - 1, axis=0)
    scy[:, 4 * R:5 * R] = pltpu.roll(pyn, nz - 1, axis=0)
    scz[:, 4 * R:5 * R] = pltpu.roll(pzn, nz - 1, axis=0) + zsh_p

    # --- pair blocks, chunked over z ---------------------------------------
    inv_lx = 1.0 / lx

    def zbody(c, _):
        zs = pl.ds(c * cz, cz)
        ox = oxr[0, zs]
        oy = oyr[0, zs]
        oz = ozr[0, zs]
        dx = scx[zs][:, None, :] - ox[:, :, None]       # (cz, R, 5R)
        dx = dx - lx * jnp.round(dx * inv_lx)           # x min image
        dy = scy[zs][:, None, :] - oy[:, :, None]
        dz = scz[zs][:, None, :] - oz[:, :, None]
        r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24)
        rinv = jax.lax.rsqrt(r2)
        d = r2 * rinv
        delta = jnp.maximum(two_r - d, 0.0)
        w = (-4.0 / 3.0) * e_eff * jnp.sqrt(r_eff * delta) * delta * rinv
        wx, wy, wz = w * dx, w * dy, w * dz
        fxo[0, zs] = jnp.sum(wx, axis=2)
        fyo[0, zs] = jnp.sum(wy, axis=2)
        fzo[0, zs] = jnp.sum(wz, axis=2)
        acx[zs] = -jnp.sum(wx[:, :, R:], axis=1)        # (cz, 4R)
        acy[zs] = -jnp.sum(wy[:, :, R:], axis=1)
        acz[zs] = -jnp.sum(wz[:, :, R:], axis=1)
        return ()

    jax.lax.fori_loop(0, nz // cz, zbody, (), unroll=False)

    # --- in-plane (0,+1) partner: roll back by +1 in z and merge -----------
    fxo[0] += pltpu.roll(acx[:, 0:R], 1, axis=0)
    fyo[0] += pltpu.roll(acy[:, 0:R], 1, axis=0)
    fzo[0] += pltpu.roll(acz[:, 0:R], 1, axis=0)

    # --- (y+1) partners: handed back in the rolled frame -------------------
    pxm[0] = acx[:, R:2 * R]
    pym[0] = acy[:, R:2 * R]
    pzm[0] = acz[:, R:2 * R]
    px0[0] = acx[:, 2 * R:3 * R]
    py0[0] = acy[:, 2 * R:3 * R]
    pz0[0] = acz[:, 2 * R:3 * R]
    pxp[0] = acx[:, 3 * R:4 * R]
    pyp[0] = acy[:, 3 * R:4 * R]
    pzp[0] = acz[:, 3 * R:4 * R]


def row_hertzian_forces_sym(
    pos: Array,   # (ny, nz, R, 3) f32, sentinel-encoded invalid slots
    box,          # (3,) box lengths (python/np values)
    radius: float,
    youngs: float,
    poisson: float,
    interpret: bool = False,
) -> Array:
    """Half-stencil fused Hertzian row forces. Returns (ny, nz, R, 3) f32.

    Drop-in for the pair_accumulate_central path of the row engine (same
    sentinel/pre-shift arithmetic; ~0.55x the pair-lane work of the 9-row
    stencil by evaluating each off-row pair once and keeping both Newton
    reductions in VMEM). Requires ny, nz >= 5 (periodic half stencil) and
    positions from build_rows (sentinels, x-sorted rows).
    """
    ny, nz, R, _ = pos.shape
    if ny < 5 or nz < 5:
        raise ValueError("row_hertzian_forces_sym needs ny, nz >= 5")
    px = pos[..., 0].astype(jnp.float32)
    py = pos[..., 1].astype(jnp.float32)
    pz = pos[..., 2].astype(jnp.float32)

    e_eff = youngs / (2.0 * (1.0 - poisson * poisson))
    # z-chunk size: multiple of the f32 sublane quantum (Mosaic must prove
    # the dynamic z offsets 8-aligned) dividing nz, largest with the
    # (cz, R, 5R) temporaries (~6 live copies) inside a ~7 MB VMEM budget
    if nz % 8 != 0:
        raise ValueError("row_hertzian_forces_sym needs nz % 8 == 0: build "
                         "the grid with make_row_grid(..., align=8)")
    budget = 7e6
    cz = 8
    for c in range(nz, 7, -8):
        if nz % c == 0 and 6 * c * R * 5 * R * 4 <= budget:
            cz = c
            break

    kern = functools.partial(
        _sym_kernel,
        float(box[0]), float(box[1]), float(box[2]),
        float(2.0 * radius), float(0.5 * radius), float(e_eff),
        cz, ny, nz, R,
    )

    own_spec = pl.BlockSpec((1, nz, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nbr_spec = pl.BlockSpec((1, nz, R), lambda i: ((i + 1) % ny, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nz, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((ny, nz, R), jnp.float32)

    outs = pl.pallas_call(
        kern,
        grid=(ny,),
        in_specs=[own_spec] * 3 + [nbr_spec] * 3,
        out_specs=(out_spec,) * 12,
        out_shape=(shape,) * 12,
        scratch_shapes=[
            pltpu.VMEM((nz, 5 * R), jnp.float32),
            pltpu.VMEM((nz, 5 * R), jnp.float32),
            pltpu.VMEM((nz, 5 * R), jnp.float32),
            pltpu.VMEM((nz, 4 * R), jnp.float32),
            pltpu.VMEM((nz, 4 * R), jnp.float32),
            pltpu.VMEM((nz, 4 * R), jnp.float32),
        ],
        interpret=interpret,
    )(px, py, pz, px, py, pz)

    fx, fy, fz = outs[0], outs[1], outs[2]
    # (y+1) partner sums: computed at (plane j, rolled z) for the particle
    # at (plane j+1, z + dz) -> roll forward and add (forces are translation
    # invariant, so the image pre-shifts need no undoing)
    for b, dz in enumerate((-1, 0, 1)):
        fx = fx + jnp.roll(outs[3 + 3 * b], (1, dz), axis=(0, 1))
        fy = fy + jnp.roll(outs[4 + 3 * b], (1, dz), axis=(0, 1))
        fz = fz + jnp.roll(outs[5 + 3 * b], (1, dz), axis=(0, 1))
    return jnp.stack([fx, fy, fz], axis=-1)
