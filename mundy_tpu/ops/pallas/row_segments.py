"""Pallas TPU kernel: half-stencil segment-segment pair ops on the row layout.

The XLA segment narrow phase (neighbor/rows.pair_accumulate_segments) runs
the clamped closest-point kernel on (R, 9R) component planes; its ~28 live
pair planes cannot stay in registers, so every one is an HBM round trip —
at 100k rods the force pass alone costs >100 ms (7.6 steps/s end to end).
This kernel keeps the ENTIRE closest-point pipeline in VMEM: the only HBM
traffic is the O(N) input planes (midpoints, half-edges, optional scalars)
and the O(N) output planes, and each off-row pair is evaluated ONCE with
both Newton's-third-law reductions accumulated while the pair block is live
(the row_central.py pattern, extended to multi-output pair kernels).

Candidate set per y-plane program: the 5-block half stencil
  [self | own z+1 | (y+1) z-1 | (y+1) z | (y+1) z+1]
concatenated along lanes into (nz, 5R) VMEM scratch planes; the other 4
neighbor rows arrive as inverse-rolled partner sums that the caller rolls
back and adds — O(N) XLA data movement.

Arithmetic contract matches pair_accumulate_segments exactly (same clamped
Lumelsky + min-of-5-candidates closest points, same coincident-pair noise
floor, sentinel invalid slots separate themselves, candidate y/z pre-shifted
to the nearest periodic image so only x needs a per-pair minimum image).
ref: the BASELINE "100k spherocylinders" config; the reference's
SpherocylinderSegment linker kernels (`scrap/parameter_interface/linkers/
src/mundy_linkers/compute_signed_separation_distance_and_contact_normal/`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_block(s_planes, oe, ce, eps, m_eps):
    """Clamped segment-segment closest points for one (cz, R, 5R) pair
    block. Inputs are the separation planes S (cand mid - own mid, min
    image), own half-edge planes (cz, R) and candidate half-edge planes
    (cz, 5R). Returns (s, t, DX, DY, DZ, d2) — identical arithmetic to
    neighbor/rows._segment_pair_chunk."""
    SX, SY, SZ = s_planes
    oex, oey, oez = oe
    cex, cey, cez = ce
    o = lambda p: p[:, :, None]    # (cz, R)  -> (cz, R, 1)   # noqa: E731
    k = lambda p: p[:, None, :]    # (cz, 5R) -> (cz, 1, 5R)  # noqa: E731

    WX = k(cex) - o(oex) - SX
    WY = k(cey) - o(oey) - SY
    WZ = k(cez) - o(oez) - SZ
    del SX, SY, SZ
    a2 = oex * oex + oey * oey + oez * oez      # (cz, R) small plane
    c2 = cex * cex + cey * cey + cez * cez      # (cz, 5R) small plane
    a = o(4.0 * a2)
    c = k(4.0 * c2)
    b = 4.0 * (o(oex) * k(cex) + o(oey) * k(cey) + o(oez) * k(cez))
    d = 2.0 * (o(oex) * WX + o(oey) * WY + o(oez) * WZ)
    e = 2.0 * (k(cex) * WX + k(cey) * WY + k(cez) * WZ)
    D = a * c - b * b

    sN = b * e - c * d
    tN = a * e - b * d
    sD = jnp.where(D > 0, D, 1.0)
    tD = sD
    s_lo = sN < 0.0
    s_hi = sN > sD
    tN = jnp.where(s_lo, e, jnp.where(s_hi, e + b, tN))
    tD = jnp.where(s_lo | s_hi, c, tD)
    sN = jnp.clip(sN, 0.0, sD)
    t_lo = tN < 0.0
    t_hi = tN > tD
    sN = jnp.where(t_lo, jnp.clip(-d, 0.0, a),
                   jnp.where(t_hi, jnp.clip(b - d, 0.0, a), sN))
    sD = jnp.where(t_lo | t_hi, jnp.maximum(a, eps), sD)
    tN = jnp.clip(tN, 0.0, tD)
    s = sN / jnp.maximum(sD, eps)
    t = tN / jnp.maximum(tD, eps)

    # min over 5 always-feasible candidates (generic clamped + 4 endpoint
    # projections) — continuous in the inputs, exact for near-parallel pairs
    w2 = WX * WX + WY * WY + WZ * WZ
    inv_a = 1.0 / jnp.maximum(a, eps)
    inv_c = 1.0 / jnp.maximum(c, eps)
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    cands = (
        (zero, jnp.clip(e * inv_c, 0.0, 1.0)),
        (one, jnp.clip((e + b) * inv_c, 0.0, 1.0)),
        (jnp.clip(-d * inv_a, 0.0, 1.0), zero),
        (jnp.clip((b - d) * inv_a, 0.0, 1.0), one),
    )

    def q(ss, tt):
        return (w2 + ss * ss * a + tt * tt * c + 2.0 * ss * d
                - 2.0 * tt * e - 2.0 * ss * tt * b)

    d2_best = q(s, t)
    for ss, tt in cands:
        d2c = q(ss, tt)
        take = d2c < d2_best
        s = jnp.where(take, ss, s)
        t = jnp.where(take, tt, t)
        d2_best = jnp.where(take, d2c, d2_best)

    DX = 2.0 * (t * k(cex) - s * o(oex)) - WX
    DY = 2.0 * (t * k(cey) - s * o(oey)) - WY
    DZ = 2.0 * (t * k(cez) - s * o(oez)) - WZ
    d2 = DX * DX + DY * DY + DZ * DZ
    # coincident closest points: exact zero vector below the reconstruction
    # noise floor (see _segment_pair_chunk — keeps 1/dist force laws from
    # amplifying 1-ulp FMA ties on self pairs into garbage forces)
    noise2 = (32.0 * m_eps) ** 2 * (a + c + w2)
    clean = d2 > noise2
    DX = jnp.where(clean, DX, 0.0)
    DY = jnp.where(clean, DY, 0.0)
    DZ = jnp.where(clean, DZ, 0.0)
    d2 = jnp.where(clean, d2, 0.0)
    return s, t, DX, DY, DZ, d2


def _seg_kernel(lx, ly, lz, cz, ny, nz, R, n_sc, n_out,
                out_fn, partner_fn, *refs):
    """refs layout:
      inputs:  own (6 + n_sc) planes (1, nz, R), nbr (6 + n_sc) planes
      outputs: n_out own planes (1, nz, R), 3 * n_out partner planes
      scratch: (6 + n_sc) candidate planes (nz, 5R),
               n_out partner accumulators (nz, 4R)
    """
    n_in = 6 + n_sc
    own_refs = refs[:n_in]
    nbr_refs = refs[n_in:2 * n_in]
    out_refs = refs[2 * n_in:2 * n_in + n_out]
    par_refs = refs[2 * n_in + n_out:2 * n_in + 4 * n_out]
    sc_refs = refs[2 * n_in + 4 * n_out:2 * n_in + 4 * n_out + n_in]
    acc_refs = refs[2 * n_in + 4 * n_out + n_in:]

    i = pl.program_id(0)
    f32 = jnp.float32
    eps = f32(1e-8)
    m_eps = f32(jnp.finfo(jnp.float32).eps)

    # --- concatenated candidate planes (coords get periodic image shifts,
    # half-edges and scalars do not) -----------------------------------
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, R), 0)
    zsh_p = jnp.where(zrow == nz - 1, f32(lz), f32(0.0))   # dz = +1
    zsh_m = jnp.where(zrow == 0, f32(-lz), f32(0.0))       # dz = -1
    ysh = jnp.where(i == ny - 1, f32(ly), f32(0.0))

    for fi in range(n_in):
        own_p = own_refs[fi][0]
        nbr_p = nbr_refs[fi][0]
        if fi == 1:          # y coordinate: neighbor plane one box away
            nbr_p = nbr_p + ysh
        sc = sc_refs[fi]
        sc[:, 0:R] = own_p
        blk1 = pltpu.roll(own_p, nz - 1, axis=0)        # own z+1
        blk2 = pltpu.roll(nbr_p, 1, axis=0)             # (y+1) z-1
        blk3 = nbr_p                                    # (y+1) z
        blk4 = pltpu.roll(nbr_p, nz - 1, axis=0)        # (y+1) z+1
        if fi == 2:          # z coordinate: wrapped rows one box away
            blk1 = blk1 + zsh_p
            blk2 = blk2 + zsh_m
            blk4 = blk4 + zsh_p
        sc[:, R:2 * R] = blk1
        sc[:, 2 * R:3 * R] = blk2
        sc[:, 3 * R:4 * R] = blk3
        sc[:, 4 * R:5 * R] = blk4

    inv_lx = 1.0 / lx

    def zbody(ci, _):
        zs = pl.ds(ci * cz, cz)
        ox, oy, oz = own_refs[0][0, zs], own_refs[1][0, zs], own_refs[2][0, zs]
        oe = (own_refs[3][0, zs], own_refs[4][0, zs], own_refs[5][0, zs])
        cxs, cys, czs = sc_refs[0][zs], sc_refs[1][zs], sc_refs[2][zs]
        ce = (sc_refs[3][zs], sc_refs[4][zs], sc_refs[5][zs])
        SX = cxs[:, None, :] - ox[:, :, None]
        SX = SX - lx * jnp.round(SX * inv_lx)            # x min image
        SY = cys[:, None, :] - oy[:, :, None]
        SZ = czs[:, None, :] - oz[:, :, None]
        s, t, DX, DY, DZ, d2 = _pair_block((SX, SY, SZ), oe, ce, eps, m_eps)
        args = [s, t, DX, DY, DZ, d2]
        for fi in range(n_sc):
            args.append(own_refs[6 + fi][0, zs][:, :, None])
            args.append(sc_refs[6 + fi][zs][:, None, :])
        # half-edge pairs ride after the geometric args, matching the
        # pair_accumulate_segments extra_fields=(hx, hy, hz) convention
        he_args = []
        for fi in range(3):
            he_args.append(oe[fi][:, :, None])
            he_args.append(ce[fi][:, None, :])
        outs = out_fn(*args, *he_args)
        pars = partner_fn(*args, *he_args)
        for oi in range(n_out):
            out_refs[oi][0, zs] = jnp.sum(outs[oi], axis=2)
            acc_refs[oi][zs] = jnp.sum(pars[oi][:, :, R:], axis=1)
        return ()

    jax.lax.fori_loop(0, nz // cz, zbody, (), unroll=False)

    # in-plane (0,+1) partner block: roll back by +1 in z and merge
    for oi in range(n_out):
        out_refs[oi][0] += pltpu.roll(acc_refs[oi][:, 0:R], 1, axis=0)
        par_refs[3 * oi][0] = acc_refs[oi][:, R:2 * R]        # (y+1, z-1)
        par_refs[3 * oi + 1][0] = acc_refs[oi][:, 2 * R:3 * R]  # (y+1, z)
        par_refs[3 * oi + 2][0] = acc_refs[oi][:, 3 * R:4 * R]  # (y+1, z+1)


def segment_vmem_bytes(nz: int, R: int, n_sc: int = 0, n_out: int = 6,
                       cz: int = 8) -> int:
    """Estimated peak VMEM of the fused pair pipeline (live (cz, R, 5R)
    planes, lane-padded) + scratch; used by callers to fall back to the XLA
    path when the kernel would not fit."""
    lanes = -(-5 * R // 128) * 128
    # peak liveness of the closest-point pipeline: ~12 planes through the
    # candidate-min loop, ~16 while out_fn/partner_fn consume (s, t, D, d2)
    # alongside their own temporaries (outputs are reduced immediately)
    live = 18
    pair = live * cz * R * lanes * 4
    scratch = (6 + n_sc) * nz * lanes * 4 + n_out * nz * (4 * R) * 4
    return pair + scratch


def row_segment_pairs_sym(
    pos: Array,       # (ny, nz, R, 3) f32 midpoints, sentinel-encoded
    half_edges: Array,  # (ny, nz, R, 3) f32, zero on invalid slots
    box,              # (3,) box lengths (python/np values)
    out_fn,
    partner_fn,
    n_out: int,
    own_scalars: tuple = (),
    interpret: bool = False,
) -> tuple:
    """Half-stencil fused segment-segment pair accumulation.

    Drop-in for pair_accumulate_segments(state, box, half_edges, out_fn,
    extra_fields=(hx, hy, hz) + own_scalars): out_fn / partner_fn receive
    (s, t, dx, dy, dz, d2, own_sc_i, cand_sc_i..., oex, cex, oey, cey,
    oez, cez) as (cz, R, 5R) planes and return n_out per-pair planes;
    out_fn's outputs are reduced over the candidate axis for the own body,
    partner_fn's over the own axis for the candidate body (Newton's third
    law with arbitrary per-side weighting — e.g. force + torque about each
    body's own center, or arc-weighted node splits). Returns n_out
    (ny, nz, R) planes.

    Requires ny, nz >= 5, nz % 8 == 0 (make_row_grid(..., align=8)), f32,
    fully periodic box, and the sentinel/pre-shift contract of build_rows.
    """
    ny, nz, R, _ = pos.shape
    if ny < 5 or nz < 5:
        raise ValueError("row_segment_pairs_sym needs ny, nz >= 5")
    if nz % 8 != 0:
        raise ValueError("row_segment_pairs_sym needs nz % 8 == 0: build "
                         "the grid with make_row_grid(..., align=8)")
    n_sc = len(own_scalars)
    planes = [pos[..., 0], pos[..., 1], pos[..., 2],
              half_edges[..., 0], half_edges[..., 1], half_edges[..., 2]]
    planes += [jnp.asarray(s, jnp.float32) for s in own_scalars]
    planes = [p.astype(jnp.float32) for p in planes]
    n_in = len(planes)

    cz = 8
    for c in range(nz, 7, -8):
        if nz % c == 0 and segment_vmem_bytes(nz, R, n_sc, n_out, c) <= 13e6:
            cz = c
            break

    kern = functools.partial(
        _seg_kernel, float(box[0]), float(box[1]), float(box[2]),
        cz, ny, nz, R, n_sc, n_out, out_fn, partner_fn,
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
        in_specs=[own_spec] * n_in + [nbr_spec] * n_in,
        out_specs=(out_spec,) * (4 * n_out),
        out_shape=(shape,) * (4 * n_out),
        scratch_shapes=(
            [pltpu.VMEM((nz, 5 * R), jnp.float32)] * n_in
            + [pltpu.VMEM((nz, 4 * R), jnp.float32)] * n_out
        ),
        interpret=interpret,
    )(*planes, *planes)

    results = []
    for oi in range(n_out):
        acc = outs[oi]
        # (y+1) partner sums: computed at (plane j, rolled z) for the body
        # at (plane j+1, z + dz) — roll forward and add (pair quantities are
        # translation invariant, so image pre-shifts need no undoing)
        for b, dz in enumerate((-1, 0, 1)):
            acc = acc + jnp.roll(outs[n_out + 3 * oi + b], (1, dz),
                                 axis=(0, 1))
        results.append(acc)
    return tuple(results)
