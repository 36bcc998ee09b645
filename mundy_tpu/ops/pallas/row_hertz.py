"""Pallas TPU kernel: fused Hertzian forces on the row-grid layout.

The row engine's hot loop (neighbor/rows.pair_accumulate) is 9 rolled
(ny, nz, R, R) pair blocks; in XLA each offset materializes (ny, nz, R, R[,3])
HBM temporaries. This kernel fuses the whole 9-offset stencil per y-plane in
VMEM: zero gathers (the layout guarantee), min-image arithmetic inline,
one HBM read per input row block and one write of the force.

Layout choices for the TPU tiling model:
- positions/masks passed as separate x/y/z component arrays (ny, nz, R):
  lane dim = R (multiple of 8; ideally 128), sublane = nz;
- grid over ny; each program handles one y-plane against its y-1/y/y+1
  neighbor planes (three BlockSpecs of the same arrays with wrapped
  index_maps — periodic in y); z-neighbors via pltpu.roll on the full-nz
  block (periodic in z); x is fully inside the row (min-image via round).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(box, two_r, r_eff, e_eff, cz,
            # own + neighbor planes (wrapped): pos components and masks
            pxm, pym, pzm, vm,  # y-1 plane: (1, nz, R) each
            pxc, pyc, pzc, vc,  # y   plane
            pxp, pyp, pzp, vp,  # y+1 plane
            fx_ref, fy_ref, fz_ref,
            sx, sy, sz, sv):  # VMEM scratch (nz, R): rolled candidates
    nz, R = pxc.shape[1], pxc.shape[2]
    n_chunks = nz // cz  # nz padded to a cz multiple by the caller

    slot = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    slot_t = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    not_self = (slot != slot_t)[None, :, :]  # (1, R, R)

    fx_ref[0] = jnp.zeros((nz, R), jnp.float32)
    fy_ref[0] = jnp.zeros((nz, R), jnp.float32)
    fz_ref[0] = jnp.zeros((nz, R), jnp.float32)

    planes = ((pxm, pym, pzm, vm, False),
              (pxc, pyc, pzc, vc, True),
              (pxp, pyp, pzp, vp, False))
    for cx_ref, cy_ref, cz_ref_, cv_ref, is_center in planes:
        for dz in (-1, 0, 1):
            # pltpu.roll requires non-negative shifts: -dz mod nz. Rolled
            # candidates go through VMEM scratch so the chunk loop can read
            # them with pl.ds (dynamic_slice on values is not lowered).
            shift = (-dz) % nz
            sx[...] = pltpu.roll(cx_ref[0], shift, axis=0) if dz else cx_ref[0]
            sy[...] = pltpu.roll(cy_ref[0], shift, axis=0) if dz else cy_ref[0]
            sz[...] = pltpu.roll(cz_ref_[0], shift, axis=0) if dz else cz_ref_[0]
            sv[...] = pltpu.roll(cv_ref[0], shift, axis=0) if dz else cv_ref[0]

            # chunk the (z, R, R) pair blocks over z to bound VMEM temps
            # (the fully unrolled version allocated 49 MB of scoped VMEM)
            def zbody(c, _):
                z0 = c * cz
                zs = pl.ds(z0, cz)
                ox = pxc[0, zs]
                oy = pyc[0, zs]
                oz = pzc[0, zs]
                ov = vc[0, zs]
                cx = sx[zs]
                cy = sy[zs]
                czp = sz[zs]
                cv = sv[zs]

                dx = ox[:, :, None] - cx[:, None, :]
                dy_ = oy[:, :, None] - cy[:, None, :]
                dz_ = oz[:, :, None] - czp[:, None, :]
                dx = dx - box[0] * jnp.round(dx * (1.0 / box[0]))
                dy_ = dy_ - box[1] * jnp.round(dy_ * (1.0 / box[1]))
                dz_ = dz_ - box[2] * jnp.round(dz_ * (1.0 / box[2]))

                r2 = jnp.maximum(dx * dx + dy_ * dy_ + dz_ * dz_, 1e-24)
                rinv = jax.lax.rsqrt(r2)
                d = r2 * rinv
                delta = jnp.maximum(two_r - d, 0.0)
                mag = (4.0 / 3.0) * e_eff * jnp.sqrt(r_eff * delta) * delta

                pair_ok = (ov[:, :, None] * cv[:, None, :]) > 0.5
                if is_center and dz == 0:
                    pair_ok = jnp.logical_and(pair_ok, not_self)
                w = jnp.where(pair_ok, mag * rinv, 0.0)
                fx_ref[0, zs] += jnp.sum(w * dx, axis=2)
                fy_ref[0, zs] += jnp.sum(w * dy_, axis=2)
                fz_ref[0, zs] += jnp.sum(w * dz_, axis=2)
                return ()

            jax.lax.fori_loop(0, n_chunks, zbody, (), unroll=False)


def row_hertzian_forces(
    pos: Array,  # (ny, nz, R, 3) f32
    valid: Array,  # (ny, nz, R) bool
    box,  # (3,) box lengths (python/np values)
    radius: float,
    youngs: float,
    poisson: float,
    interpret: bool = False,
) -> Array:
    """Fused row-grid Hertzian forces. Returns (ny, nz, R, 3) f32.

    Drop-in for the XLA pair_accumulate path of the row engine (validated
    equal to 1e-5 relative); periodic in all three axes via min-image.
    """
    ny, nz, R, _ = pos.shape
    px = pos[..., 0].astype(jnp.float32)
    py = pos[..., 1].astype(jnp.float32)
    pz = pos[..., 2].astype(jnp.float32)
    v = valid.astype(jnp.float32)

    e_eff = youngs / (2.0 * (1.0 - poisson * poisson))
    # z-chunk size: largest divisor of nz <= 16 (the roll wrap needs the
    # block to span the full nz, so padding is not an option)
    cz = 1
    for c in range(min(16, nz), 0, -1):
        if nz % c == 0:
            cz = c
            break
    # constants baked as python floats (traced closures are rejected)
    kern = functools.partial(
        _kernel,
        tuple(float(b) for b in box),
        float(2.0 * radius),
        float(0.5 * radius),
        float(e_eff),
        cz,
    )

    def spec(offset):
        return pl.BlockSpec((1, nz, R), lambda i: ((i + offset) % ny, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = []
    for off in (-1, 0, 1):
        in_specs += [spec(off)] * 4
    out_spec = pl.BlockSpec((1, nz, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    inputs = []
    for _ in range(3):
        inputs += [px, py, pz, v]

    fx, fy, fz = pl.pallas_call(
        kern,
        grid=(ny,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((ny, nz, R), jnp.float32),
            jax.ShapeDtypeStruct((ny, nz, R), jnp.float32),
            jax.ShapeDtypeStruct((ny, nz, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nz, R), jnp.float32),
            pltpu.VMEM((nz, R), jnp.float32),
            pltpu.VMEM((nz, R), jnp.float32),
            pltpu.VMEM((nz, R), jnp.float32),
        ],
        interpret=interpret,
    )(*[inputs[i] for i in _input_order()])
    return jnp.stack([fx, fy, fz], axis=-1)


def _input_order():
    """Inputs are passed plane-major: (y-1: px py pz v), (y: ...), (y+1: ...).

    The `inputs` list above is built as [px,py,pz,v]*3 but each triple must
    bind to its plane's BlockSpec — the arrays are identical per plane, only
    the index_map differs, so identity order is correct.
    """
    return list(range(12))
