"""Dense 3D-cell engine: gather-free wide-cutoff pairwise operators.

The row engine (rows.py) keeps the x axis dense inside each (y, z) cell
column — right for contact-scale cutoffs where the row is O(10-100) slots.
For WIDE cutoffs (the spectral-Ewald real-space correction at r_cut ~ 3-8
interparticle spacings) the row design wastes the full x extent per pair,
and the (N, K) neighbor-matrix alternative is far worse: K grows to
O(100-2000) and its K-pass extraction + per-apply gathers dominate
everything (measured 20 s per hydro rebuild at 262k bodies).

This engine is the 3D completion of the row idea:

- particles live in a dense (nx, ny, nz, C) cell layout (cell edge >=
  cutoff, capacity C with sentinel-filled empty slots) — one sort + one
  scatter to build, like build_rows;
- the neighbor candidates of a cell are its 27 neighbor cells: 26 jnp.roll
  shifts over the three grid axes with periodic image pre-shifts applied
  per axis — ZERO per-pair minimum-image work and zero gathers;
- a pairwise tensor kernel (e.g. the RPY real-space correction) runs on
  dense (C, 27C) pair blocks on the VPU, with per-slot payload channels
  (forces) riding the same rolled planes.

ref: this replaces the reference's neighbor-linker pipeline for the hydro
interaction class (`GenNeighborLinkers.hpp` + `RPYSpheres.hpp` O(N*k)
team sums).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mundy_tpu.core.containers import pytree_dataclass, static_field


@pytree_dataclass
class CellGrid3D:
    origin: Array  # (3,)
    edge: Array  # (3,) cell edge per axis
    nx: int = static_field(default=1)
    ny: int = static_field(default=1)
    nz: int = static_field(default=1)
    capacity: int = static_field(default=8)


@pytree_dataclass
class Cells3DState:
    grid: CellGrid3D
    pos: Array  # (nx, ny, nz, C, 3) sentinel-filled
    perm: Array  # (nx, ny, nz, C) int32 particle id per slot (n = empty)
    overflow: Array  # () bool


def make_cell_grid3d(box_lengths, cutoff: float, n_particles: int,
                     capacity_slack: float = 1.15,
                     dtype=jnp.float32) -> CellGrid3D:
    """Cells with edge >= cutoff on every axis; capacity from the
    Poisson-max estimate with slack (overflow flag on violation)."""
    L = np.asarray(box_lengths, np.float64)
    n = np.maximum((L // cutoff).astype(int), 1)
    n_cells = int(n[0] * n[1] * n[2])
    occ = n_particles / n_cells
    cap = int(occ * capacity_slack + 6 * math.sqrt(occ + 4) + 4)
    cap = ((cap + 7) // 8) * 8
    return CellGrid3D(origin=jnp.zeros((3,), dtype),
                      edge=jnp.asarray(L / n, dtype),
                      nx=int(n[0]), ny=int(n[1]), nz=int(n[2]),
                      capacity=cap)


def build_cells3d(pos: Array, grid: CellGrid3D) -> Cells3DState:
    """Flat (N, 3) positions -> dense 3D cell layout (one sort + scatter)."""
    n = pos.shape[0]
    C = grid.capacity
    dims = jnp.asarray([grid.nx, grid.ny, grid.nz], jnp.int32)
    ic = jnp.clip(((pos - grid.origin) / grid.edge).astype(jnp.int32),
                  0, dims - 1)
    cell = (ic[:, 0] * grid.ny + ic[:, 1]) * grid.nz + ic[:, 2]
    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.concatenate([jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
    starts = jnp.where(first, jnp.arange(n, dtype=jnp.int32), 0)
    cell_start = jax.lax.associative_scan(jnp.maximum, starts)
    rank = jnp.arange(n, dtype=jnp.int32) - cell_start
    n_cells = grid.nx * grid.ny * grid.nz
    counts = jnp.zeros((n_cells,), jnp.int32).at[cell].add(1)
    overflow = jnp.any(counts > C)
    slot = cell_s * C + jnp.minimum(rank, C - 1)
    slot = jnp.where(rank < C, slot, n_cells * C)
    # sentinel: empty slots sit ~1e6 boxes away in y (beyond every cutoff
    # against real particles; sentinel-sentinel pairs rely on zero payload)
    ext_y = grid.edge[1] * grid.ny
    sentinel_y = grid.origin[1] - 1e6 * (ext_y + 1.0)
    flat_pos = jnp.zeros((n_cells * C, 3), pos.dtype)
    flat_pos = flat_pos.at[:, 1].set(sentinel_y.astype(pos.dtype))
    flat_pos = flat_pos.at[slot].set(pos[order], mode="drop")
    flat_perm = jnp.full((n_cells * C,), n, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    shape = (grid.nx, grid.ny, grid.nz, C)
    return Cells3DState(grid=grid, pos=flat_pos.reshape(shape + (3,)),
                        perm=flat_perm.reshape(shape), overflow=overflow)


def _axis_shift(n: int, d: int, L: float, dtype) -> Array:
    idx = np.arange(n)
    s = np.where(idx + d >= n, L, np.where(idx + d < 0, -L, 0.0))
    return jnp.asarray(s, dtype)


def pair_apply_cells3d(
    state: Cells3DState,
    box_lengths,
    payload: Array,  # (nx, ny, nz, C, D) per-slot input channels (zeroed
    #                  on empty slots by the caller!)
    kernel: Callable[..., Array],
    out_dim: int,
    hbm_budget_bytes: float = 2.0e9,
    x_range=None,
) -> Array:
    """Dense pairwise reduction over the 27-cell neighborhood.

    kernel(DX, DY, DZ, r2, pj) with pair blocks (rows, nz, C, 27C) and
    payload pj (rows, nz, 27C, D) must return the REDUCED per-slot output
    (rows, nz, C, out_dim) (reduce over the 27C lane axis inside — the
    full pair-block output would be D x 27C times larger than the inputs).
    The kernel must vanish beyond the grid cutoff (sentinel slots separate
    themselves from real particles) AND for zero payload (sentinel-
    sentinel and empty-slot pairs carry payload 0). Self-pairs (sep = 0,
    own payload) are NOT excluded — kernels that must skip them subtract
    the self term or use an r2 > 0 mask.

    `x_range = (x0, nxl)`: evaluate only the x-slab of cells [x0, x0+nxl)
    as TARGETS (candidates still come from the full periodic grid) — the
    spatial-decomposition hook for sharded evaluation (x0 may be traced,
    nxl is static). Returns (nxl, ny, nz, C, out_dim); default full grid.

    Returns (nx, ny, nz, C, out_dim).
    """
    pos = state.pos
    nx, ny, nz, C = pos.shape[:4]
    dtype = pos.dtype
    L = tuple(float(v) for v in box_lengths)
    if nx < 3 or ny < 3 or nz < 3:
        raise ValueError("pair_apply_cells3d needs >= 3 cells per axis")
    D = payload.shape[-1]

    # 27 rolled candidate blocks, concatenated along one lane axis, with
    # periodic image shifts pre-applied per axis
    cand = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) == (0, 0, 0):
                    cp, cf = pos, payload
                else:
                    cp = jnp.roll(pos, (-dx, -dy, -dz), axis=(0, 1, 2))
                    cf = jnp.roll(payload, (-dx, -dy, -dz), axis=(0, 1, 2))
                x, y, z = cp[..., 0], cp[..., 1], cp[..., 2]
                if dx != 0:
                    x = x + _axis_shift(nx, dx, L[0], dtype)[:, None, None, None]
                if dy != 0:
                    y = y + _axis_shift(ny, dy, L[1], dtype)[None, :, None, None]
                if dz != 0:
                    z = z + _axis_shift(nz, dz, L[2], dtype)[None, None, :, None]
                cand.append((x, y, z, cf))
    cx = jnp.concatenate([c[0] for c in cand], axis=-1)  # (nx,ny,nz,27C)
    cy = jnp.concatenate([c[1] for c in cand], axis=-1)
    cz = jnp.concatenate([c[2] for c in cand], axis=-1)
    cf = jnp.concatenate([c[3] for c in cand], axis=-2)  # (nx,ny,nz,27C,D)

    ox, oy, oz = pos[..., 0], pos[..., 1], pos[..., 2]
    if x_range is not None:
        x0, nxl = x_range
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, x0, nxl, 0)  # noqa: E731
        ox, oy, oz = sl(ox), sl(oy), sl(oz)
        cx, cy, cz, cf = sl(cx), sl(cy), sl(cz), sl(cf)
        nx_out = nxl
    else:
        nx_out = nx
    ox = ox.reshape(nx_out * ny, nz, C)
    oy = oy.reshape(nx_out * ny, nz, C)
    oz = oz.reshape(nx_out * ny, nz, C)
    cx = cx.reshape(nx_out * ny, nz, 27 * C)
    cy = cy.reshape(nx_out * ny, nz, 27 * C)
    cz = cz.reshape(nx_out * ny, nz, 27 * C)
    cf = cf.reshape(nx_out * ny, nz, 27 * C, D)

    def chunk_fn(args):
        oxc, oyc, ozc, cxc, cyc, czc, cfc = args
        DX = cxc[..., None, :] - oxc[..., :, None]   # (rows, nz, C, 27C)
        DY = cyc[..., None, :] - oyc[..., :, None]
        DZ = czc[..., None, :] - ozc[..., :, None]
        r2 = DX * DX + DY * DY + DZ * DZ
        return kernel(DX, DY, DZ, r2, cfc)

    itemsize = jnp.dtype(dtype).itemsize
    bytes_per_row = (8 + 2 * D) * nz * C * 27 * C * itemsize
    cr = max(1, int(hbm_budget_bytes // max(bytes_per_row, 1)))
    out = jax.lax.map(chunk_fn, (ox, oy, oz, cx, cy, cz, cf), batch_size=cr)
    return out.reshape(nx_out, ny, nz, C, out_dim)


def scatter_to_flat(state: Cells3DState, values: Array, n: int) -> Array:
    """(nx, ny, nz, C, D) slot values -> flat (n, D) by particle id."""
    D = values.shape[-1]
    flat_perm = state.perm.reshape(-1)
    out = jnp.zeros((n + 1, D), values.dtype)
    out = out.at[jnp.minimum(flat_perm, n)].set(
        values.reshape(-1, D), mode="drop")
    return out[:n]


def gather_from_flat(state: Cells3DState, values: Array) -> Array:
    """Flat (n, D) -> (nx, ny, nz, C, D) slot layout (zero on empty)."""
    n = values.shape[0]
    perm = state.perm
    v = values[jnp.minimum(perm.reshape(-1), n - 1)]
    v = jnp.where((perm.reshape(-1) < n)[:, None], v, 0.0)
    return v.reshape(perm.shape + (values.shape[-1],))
