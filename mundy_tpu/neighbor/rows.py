"""Dense row-grid engine: gather-free neighbor interactions.

Motivation (measured on TPU v5e at N=1e5): every irregular-access primitive
costs ~5-10 ns/element — argsort ~800 ms, top_k ~650 ms, scatter ~240 ms,
take_along ~7 ns/elem — so ANY per-pair candidate materialization dominates
the step. This engine removes irregular access from the hot path entirely:

- particles live in a dense (ny, nz, R) row layout: a "row" is the full x
  extent of one (y, z) cell column, padded to R slots (structure-of-arrays
  with validity masks — the bucketed-mesh idea of STK, shaped for the VPU);
- neighbor candidates of a row are the 9 rows (y+dy, z+dz): obtained by
  `jnp.roll` over the (ny, nz) axes — pure regular data movement, periodic
  wrap included (min-image metrics fix the coordinate offsets);
- pair interactions are dense (R x R) blocks on the VPU — more FLOPs than a
  compacted neighbor list, but zero gathers, and FLOPs are free relative to
  irregular memory on TPU;
- the state STAYS in row layout between rebuilds; a rebuild is one argsort
  of N keys + one N-element scatter (~10 ms at 1e5), triggered by the skin
  displacement check.

Cell size along y/z must be >= the interaction cutoff; x is not windowed
(a row spans the box in x), so rows should be O(10-100) particles — true
whenever nx ~ N^(1/3) >> 1.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mundy_tpu.core.containers import pytree_dataclass, static_field
from mundy_tpu.geom.periodicity import Metric


@pytree_dataclass
class RowGrid:
    """Static geometry of the (y, z) row decomposition."""

    origin: Array  # (3,)
    cell_yz: Array  # (2,) row cell edge along y, z
    ny: int = static_field(default=1)
    nz: int = static_field(default=1)
    row_capacity: int = static_field(default=32)


@pytree_dataclass
class RowState:
    """Dense row-layout particle state."""

    grid: RowGrid
    pos: Array  # (ny, nz, R, 3)
    gid: Array  # (ny, nz, R) int32 global ids (for RNG streams / unsort)
    valid: Array  # (ny, nz, R) bool
    ref_pos: Array  # (ny, nz, R, 3) positions at last rebuild
    overflow: Array  # () bool


def make_row_grid(domain_low, domain_high, cutoff: float, n_particles: int,
                  capacity_slack: float = 2.0, dtype=jnp.float32) -> RowGrid:
    """Rows sized so the y/z cell edge >= cutoff; capacity from the mean
    occupancy with slack (overflow flag + host regrow on violation)."""
    low = np.asarray(domain_low, np.float64)
    high = np.asarray(domain_high, np.float64)
    ext = high - low
    ny = max(int(ext[1] // cutoff), 1)
    nz = max(int(ext[2] // cutoff), 1)
    mean_occ = n_particles / (ny * nz)
    cap = int(np.ceil(mean_occ * capacity_slack + 8))
    # round capacity to the VPU sublane quantum
    cap = ((cap + 7) // 8) * 8
    return RowGrid(
        origin=jnp.asarray(low, dtype),
        cell_yz=jnp.asarray([ext[1] / ny, ext[2] / nz], dtype),
        ny=ny, nz=nz, row_capacity=cap,
    )


def _row_coords(grid: RowGrid, pos: Array):
    iy = jnp.floor((pos[..., 1] - grid.origin[1]) / grid.cell_yz[0]).astype(jnp.int32)
    iz = jnp.floor((pos[..., 2] - grid.origin[2]) / grid.cell_yz[1]).astype(jnp.int32)
    iy = jnp.clip(iy, 0, grid.ny - 1)
    iz = jnp.clip(iz, 0, grid.nz - 1)
    return iy, iz


def build_rows(pos: Array, gid: Array, grid: RowGrid) -> RowState:
    """Flat (N, 3) positions -> dense row layout. One sort + one scatter."""
    n = pos.shape[0]
    R = grid.row_capacity
    iy, iz = _row_coords(grid, pos)
    row = iy * grid.nz + iz
    # two-key sort (x within row): sort by x, then stable-sort by row
    order_x = jnp.argsort(pos[:, 0])
    order = order_x[jnp.argsort(row[order_x], stable=True)]

    row_sorted = row[order]
    first = jnp.concatenate([jnp.ones((1,), bool), row_sorted[1:] != row_sorted[:-1]])
    starts = jnp.where(first, jnp.arange(n, dtype=jnp.int32), 0)
    row_start = jax.lax.associative_scan(jnp.maximum, starts)
    rank = jnp.arange(n, dtype=jnp.int32) - row_start

    counts = jnp.zeros((grid.ny * grid.nz,), jnp.int32).at[row].add(1)
    overflow = jnp.any(counts > R)

    slot = row_sorted * R + jnp.minimum(rank, R - 1)
    slot = jnp.where(rank < R, slot, grid.ny * grid.nz * R)  # drop overflows
    flat_pos = jnp.zeros((grid.ny * grid.nz * R, 3), pos.dtype)
    flat_pos = flat_pos.at[slot].set(pos[order], mode="drop")
    flat_gid = jnp.zeros((grid.ny * grid.nz * R,), jnp.int32)
    flat_gid = flat_gid.at[slot].set(gid[order].astype(jnp.int32), mode="drop")
    flat_valid = jnp.zeros((grid.ny * grid.nz * R,), bool)
    flat_valid = flat_valid.at[slot].set(True, mode="drop")

    shape = (grid.ny, grid.nz, R)
    p = flat_pos.reshape(shape + (3,))
    return RowState(grid=grid, pos=p, gid=flat_gid.reshape(shape),
                    valid=flat_valid.reshape(shape), ref_pos=p,
                    overflow=overflow)


def rows_to_flat(state: RowState, n: int):
    """Dense layout -> flat (N, 3) positions ordered by global id."""
    flat_pos = state.pos.reshape(-1, 3)
    flat_gid = state.gid.reshape(-1)
    flat_valid = state.valid.reshape(-1)
    out = jnp.zeros((n, 3), state.pos.dtype)
    idx = jnp.where(flat_valid, flat_gid, n)
    return out.at[idx].set(flat_pos, mode="drop")


def pair_accumulate(
    state: RowState,
    metric: Metric,
    pair_fn: Callable[[Array, Array, Array], Array],
    extra_fields: tuple = (),
) -> Array:
    """Accumulate sum_j pair_fn over the 9-row neighborhood, gather-free.

    pair_fn(sep_vec (..., 3), r2 (...), mask (...)) -> (..., 3) per-pair
    force contribution ON the row particle (already masked). extra_fields:
    optional per-particle (ny, nz, R, ...) arrays; pair_fn then receives
    (sep, r2, mask, own_field..., cand_field...) per extra field.

    Work: 9 * ny * nz * R^2 dense pair evals on the VPU; the only data
    movement is 9 rolls of the row arrays.
    """
    pos = state.pos
    valid = state.valid
    force = jnp.zeros_like(pos)
    R = pos.shape[2]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)

    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            if dy == 0 and dz == 0:
                cand_pos, cand_valid = pos, valid
                cand_extras = extra_fields
                self_pair = slot_ids[..., :, None] == slot_ids[..., None, :]
            else:
                cand_pos = jnp.roll(pos, (-dy, -dz), axis=(0, 1))
                cand_valid = jnp.roll(valid, (-dy, -dz), axis=(0, 1))
                cand_extras = tuple(
                    jnp.roll(f, (-dy, -dz), axis=(0, 1)) for f in extra_fields
                )
                self_pair = False
            # (ny, nz, R, R, 3): own slot i vs candidate slot j
            sep = metric.sep(pos[..., :, None, :], cand_pos[..., None, :, :])
            r2 = jnp.sum(sep * sep, axis=-1)
            mask = valid[..., :, None] & cand_valid[..., None, :]
            if dy == 0 and dz == 0:
                mask = mask & ~self_pair
            args = [sep, r2, mask]
            for own_f, cand_f in zip(extra_fields, cand_extras):
                args.append(own_f[..., :, None])
                args.append(cand_f[..., None, :])
            force = force + jnp.sum(pair_fn(*args), axis=3)
    return force


def moved_beyond_skin(state: RowState, metric: Metric, skin: float) -> Array:
    disp = metric.sep(state.ref_pos, state.pos)
    d2 = jnp.sum(disp * disp, axis=-1)
    d2 = jnp.where(state.valid, d2, 0.0)
    return jnp.max(d2) > (0.5 * skin) ** 2
