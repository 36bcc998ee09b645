"""Slab-local row rebuild shared by the sharded engines.

The skin trigger bounds displacement to under one z-cell between rebuilds,
so when a slab re-sorts its rows, migrants can only come from its two
boundary z-planes. Each shard packs its out-of-slab particles into
fixed-capacity buffers (one boundary plane's worth each way), exchanges
them with the ring neighbors via `lax.ppermute`, and re-sorts only its own
(ny, nzl, R) block — O(ny*R) comms and O(N/d log N/d) sort per shard,
versus the O(N) psum + replicated global sort of the all-gather resort.

This is the distributed-search analog of STK's incremental ghosting update
(reference `GenNeighborLinkers.hpp:700-741`): only boundary entities change
ranks. Because a row is a full x-column of one (y, z) cell, its members
always live in a single slab, so the local resort reproduces the global
resort's rows exactly — sharded trajectories stay bit-identical to the
single-chip row engine.

Per-particle payload channels (e.g. spherocylinder quaternions) migrate
with their particles via `extras`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mundy_tpu.neighbor.rows import RowGrid, _row_coords


def local_resort_ok(d: int, nzl: int) -> bool:
    """Local resort needs >= 2 planes per slab (left-migrant plane iz=z0-1
    and right-migrant plane iz=z0+nzl must be distinct cells) and a real
    ring (d >= 2)."""
    return d >= 2 and nzl >= 2


def slab_local_resort(pos, valid, gid, grid: RowGrid, nzl: int, axis: str,
                      d: int, extras=(), extra_fill=None, ovf=None):
    """Re-sort one shard's (ny, nzl, R) slab block locally.

    pos: (ny, nzl, R, 3); valid: (ny, nzl, R) bool; gid: (ny, nzl, R) int32.
    extras: tuple of (ny, nzl, R, C) float arrays (same dtype as pos) that
    migrate with their particles; `extra_fill` optionally gives each a (C,)
    fill vector for invalid slots (e.g. the identity quaternion — zero
    quaternions would NaN downstream normalizations). Returns
    (pos, valid, gid, extras, ovf) with ovf OR'd with migrant-buffer
    overflow, row-capacity overflow, and any particle that moved more than
    one plane since the trigger (which would otherwise vanish silently).
    """
    ny, _nzl, R = valid.shape
    nz = grid.nz
    dtype = pos.dtype
    if ovf is None:
        ovf = jnp.asarray(False)
    perm_up = [(i, (i + 1) % d) for i in range(d)]
    perm_dn = [(i, (i - 1) % d) for i in range(d)]
    n_rows_loc = ny * nzl
    n_loc = n_rows_loc * R
    M = ny * R  # migrant capacity: one full boundary plane each way
    sentinel_y = (grid.origin[1]
                  - 1e6 * (grid.cell_yz[0] * ny + 1.0)).astype(dtype)

    # payload = [pos | extras] as one (n_loc, 3 + sum C) matrix so packing,
    # ppermute, and the final scatter each run once
    cols = [pos.reshape(n_loc, 3)]
    widths = []
    for e in extras:
        c = int(e.size // n_loc)
        widths.append(c)
        cols.append(e.reshape(n_loc, c).astype(dtype))
    pay = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    W = pay.shape[1]
    v = valid.reshape(-1)
    g = gid.reshape(-1)

    # default row for empty slots: sentinel y-position + per-extra fills
    default = jnp.zeros((W,), dtype).at[1].set(sentinel_y)
    if extra_fill is not None:
        off = 3
        for c, fill in zip(widths, extra_fill):
            if fill is not None:
                default = jax.lax.dynamic_update_slice(
                    default, jnp.asarray(fill, dtype).reshape(c), (off,))
            off += c

    me = jax.lax.axis_index(axis)
    z0 = me * nzl
    _, iz = _row_coords(grid, pay[:, :3])
    delta = jnp.mod(iz - z0, nz)
    go_l = jnp.logical_and(v, delta == nz - 1)
    go_r = jnp.logical_and(v, delta == nzl)
    lost = jnp.logical_and(v, jnp.logical_and(delta > nzl, delta < nz - 1))
    ovf = jnp.logical_or(ovf, jnp.any(lost))

    def pack(mask):
        idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
        idx = jnp.where(mask, idx, M)
        bovf = jnp.sum(mask) > M
        bp = jnp.broadcast_to(default, (M, W)).at[idx].set(pay, mode="drop")
        bg = jnp.zeros((M,), jnp.int32).at[idx].set(g, mode="drop")
        bv = jnp.zeros((M,), bool).at[idx].set(mask, mode="drop")
        return bp, bg, bv, bovf

    lp, lg, lv, ovf_l = pack(go_l)
    rp, rg, rv, ovf_r = pack(go_r)
    # left-bound migrants travel to me-1 (perm_dn), right-bound to me+1
    lp, lg, lv = [jax.lax.ppermute(x, axis, perm_dn) for x in (lp, lg, lv)]
    rp, rg, rv = [jax.lax.ppermute(x, axis, perm_up) for x in (rp, rg, rv)]

    cp = jnp.concatenate([pay, lp, rp], axis=0)
    cg = jnp.concatenate([g, lg, rg], axis=0)
    cv = jnp.concatenate([jnp.logical_and(v, delta < nzl), lv, rv], axis=0)
    ciy, ciz = _row_coords(grid, cp[:, :3])
    cdelta = jnp.mod(ciz - z0, nz)
    stray = jnp.logical_and(cv, cdelta >= nzl)  # moved >1 plane: flag
    cv = jnp.logical_and(cv, cdelta < nzl)
    row = jnp.where(cv, ciy * nzl + cdelta, n_rows_loc)

    m = row.shape[0]
    order_x = jnp.argsort(cp[:, 0])
    order = order_x[jnp.argsort(row[order_x], stable=True)]
    row_s = row[order]
    first = jnp.concatenate([jnp.ones((1,), bool), row_s[1:] != row_s[:-1]])
    starts = jnp.where(first, jnp.arange(m, dtype=jnp.int32), 0)
    row_start = jax.lax.associative_scan(jnp.maximum, starts)
    rank = jnp.arange(m, dtype=jnp.int32) - row_start
    counts = jnp.zeros((n_rows_loc,), jnp.int32).at[row].add(
        cv.astype(jnp.int32), mode="drop")
    ovf = ovf | ovf_l | ovf_r | jnp.any(counts > R) | jnp.any(stray)

    slot = row_s * R + jnp.minimum(rank, R - 1)
    keep = jnp.logical_and(rank < R, row_s < n_rows_loc)
    slot = jnp.where(keep, slot, n_loc)
    fp = jnp.broadcast_to(default, (n_loc, W)).at[slot].set(
        cp[order], mode="drop")
    fg = jnp.zeros((n_loc,), jnp.int32).at[slot].set(cg[order], mode="drop")
    fv = jnp.zeros((n_loc,), bool).at[slot].set(cv[order], mode="drop")

    new_pos = fp[:, :3].reshape(ny, nzl, R, 3)
    new_extras = []
    off = 3
    for e, c in zip(extras, widths):
        new_extras.append(
            fp[:, off:off + c].reshape(ny, nzl, R, c).astype(e.dtype))
        off += c
    return (new_pos, fv.reshape(ny, nzl, R), fg.reshape(ny, nzl, R),
            tuple(new_extras), ovf)
