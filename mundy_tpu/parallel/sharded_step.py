"""Sharded spheres step over a 1-D device mesh (v1: gather-based halo).

The spatial-domain-decomposition analog of the reference's MPI ranks
(SURVEY.md §2.7): particle arrays are sharded over the mesh axis; each shard
all-gathers positions over ICI (the halo/ghosting step — at this stage the
full position set plays the role of the reference's neighbor aura,
`GenNeighborLinkers.hpp:700-741`), rebuilds the cell grid redundantly
per-shard (cheap, replicated compute beats a second collective), and
evaluates neighbor search + Hertzian forces + the Euler update only for its
local slice. Global reductions (`stk::all_reduce_max` analogs) ride `pmax`.

v2 (later): slab-decomposed cell lists exchanging only boundary slabs via
`ppermute`, Hilbert-resharding for load balance.
"""

from __future__ import annotations

import math as _math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mundy_tpu.dynamics import brownian_velocity, euler_step
from mundy_tpu.forces import hertzian_contact_forces
from mundy_tpu.geom import periodic
from mundy_tpu.neighbor import build_cell_list, make_cell_grid
from mundy_tpu.neighbor.cell_list import (
    NeighborMatrix,
    _cell_coords,
    _neighbor_cells_of,
)


def _local_neighbor_rows(local_pos, local_ids, full_pos, clist, search_radius,
                         metric, max_neighbors):
    """Neighbor rows for the local particle slice against the full set."""
    n_local = local_pos.shape[0]
    cap = clist.entries.shape[1]
    coords = _cell_coords(clist.grid, local_pos)
    cells27, valid27 = _neighbor_cells_of(clist.grid, coords)
    cand = clist.entries[cells27]
    cand = jnp.where(valid27[..., None], cand, -1).reshape(n_local, 27 * cap)

    cand_pos = full_pos[jnp.maximum(cand, 0)]
    sep = metric.sep(local_pos[:, None, :], cand_pos)
    d2 = jnp.sum(sep * sep, axis=-1)
    cutoff = 2.0 * jnp.asarray(search_radius)
    if cutoff.ndim == 1:  # per-query radii (e.g. inactive slots get -1)
        cutoff = cutoff[:, None]
    # (cutoff > 0) guards inactive query slots (negative sentinel radius —
    # squaring alone would resurrect them)
    ok = (cand >= 0) & (cutoff > 0) & (d2 <= cutoff * cutoff) & (cand != local_ids[:, None])

    # binary-search compaction (see cell_list._compact_rows)
    from mundy_tpu.neighbor.cell_list import _compact_rows

    n_full = full_pos.shape[0]
    row_idx, row_ok, count = _compact_rows(cand, ok, max_neighbors, n_full)
    return NeighborMatrix(
        idx=row_idx, mask=row_ok, overflow=jnp.any(count > max_neighbors)
    )


def make_sharded_spheres_step(
    mesh: Mesh,
    axis: str,
    n_total: int,
    box_size: float,
    radius: float,
    youngs: float = 100.0,
    poisson: float = 0.3,
    viscosity: float = 1.0,
    diffusion: float = 0.1,
    dt: float = 1e-4,
    skin: float = 0.5,
    max_neighbors: int = 32,
    cell_capacity: int = 32,
    dtype=jnp.float32,
):
    """Returns (step_fn, init_fn) with pos sharded as P(axis) over `mesh`.

    step_fn(pos, key, step) -> (pos, max_overlap) — one full simulation step
    (broad phase + Hertzian forces + Brownian + Euler), jittable under the
    given mesh; max_overlap is a pmax'd global diagnostic.
    """
    n_dev = mesh.shape[axis]
    if n_total % n_dev != 0:
        raise ValueError("n_total must divide the mesh axis size")
    box = np.array([box_size] * 3)
    metric = periodic(box, dtype=dtype)
    search_radius = radius + 0.5 * skin
    grid = make_cell_grid([0, 0, 0], box, 2 * search_radius, (True,) * 3, dtype)
    inv_drag = 1.0 / (6.0 * _math.pi * viscosity * radius)

    def local_step(pos_local, key, step):
        me = jax.lax.axis_index(axis)
        n_local = pos_local.shape[0]
        local_ids = me * n_local + jnp.arange(n_local, dtype=jnp.int32)

        # halo: gather all positions over ICI (v1 full gather)
        full_pos = jax.lax.all_gather(pos_local, axis, tiled=True)

        clist = build_cell_list(full_pos, grid, cell_capacity)
        nmat = _local_neighbor_rows(
            pos_local, local_ids, full_pos, clist,
            jnp.asarray(search_radius, dtype), metric, max_neighbors,
        )

        # forces on the local slice (gather neighbor data from the full set)
        idxc = jnp.minimum(nmat.idx, n_total - 1)
        sep = metric.sep(pos_local[:, None, :], full_pos[idxc])
        d = jnp.sqrt(jnp.maximum(jnp.sum(sep * sep, axis=-1), 1e-24))
        nhat = sep / d[..., None]
        signed = d - 2 * radius
        delta = jnp.where(nmat.mask, jnp.maximum(-signed, 0.0), 0.0)
        e_eff = youngs / (2.0 * (1.0 - poisson**2))
        mag = (4.0 / 3.0) * e_eff * jnp.sqrt(radius / 2.0) * delta ** 1.5
        force = -jnp.sum(mag[..., None] * nhat, axis=1)

        vel = inv_drag * force
        if diffusion > 0:
            kb = jax.random.fold_in(jax.random.fold_in(key, step), me)
            z = jax.random.normal(kb, (n_local, 3), dtype=dtype)
            vel = vel + jnp.sqrt(jnp.asarray(2.0 * diffusion / dt, dtype)) * z

        new_pos = euler_step(pos_local, vel, jnp.asarray(dt, dtype), metric=metric)
        max_overlap = jax.lax.pmax(jnp.max(delta), axis)
        return new_pos, max_overlap

    step_fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P()),
            check_vma=False,
        )
    )

    def init_fn(key):
        pos = jax.random.uniform(key, (n_total, 3), dtype=dtype, maxval=box_size)
        return jax.device_put(pos, NamedSharding(mesh, P(axis)))

    return step_fn, init_fn


# ---------------------------------------------------------------------------
# v2: slab domain decomposition (halo exchange via ppermute, migration)
# ---------------------------------------------------------------------------
def make_slab_spheres_step(
    mesh: Mesh,
    axis: str,
    n_total: int,
    box_size: float,
    radius: float,
    youngs: float = 100.0,
    poisson: float = 0.3,
    viscosity: float = 1.0,
    diffusion: float = 0.1,
    dt: float = 1e-4,
    skin: float = 0.5,
    max_neighbors: int = 32,
    cell_capacity: int = 32,
    slot_slack: float = 1.6,
    halo_fraction: float = 1.0,
    dtype=jnp.float32,
):
    """Spatially-decomposed spheres step: each shard owns a slab along x,
    exchanges only boundary particles with ring neighbors (ppermute over
    ICI), and migrates leavers — the scalable replacement for the v1
    all-gather halo. Returns (step_fn, init_fn).

    step_fn(shard_state, key, step) -> (shard_state, max_overlap): one full
    step (halo + cell-list broad phase + Hertzian + Brownian + Euler +
    migration). Brownian streams are keyed by global particle id, so
    trajectories are invariant to which shard owns a particle.
    """
    from mundy_tpu.parallel.slab import ShardState, halo_exchange, migrate

    n_dev = mesh.shape[axis]
    capacity = int(np.ceil(n_total / n_dev * slot_slack))
    # halo must hold every particle within halo_width of a slab face; with
    # thin slabs that approaches the whole slab, so default to full capacity
    halo_capacity = max(64, int(capacity * halo_fraction))
    box = np.array([box_size] * 3)
    metric = periodic(box, dtype=dtype)
    search_radius = radius + 0.5 * skin
    grid = make_cell_grid([0, 0, 0], box, 2 * search_radius, (True,) * 3, dtype)
    inv_drag = 1.0 / (6.0 * _math.pi * viscosity * radius)
    e_eff = youngs / (2.0 * (1.0 - poisson**2))

    def local_step(pos, active, gid, overflow, key, step):
        state = ShardState(pos=pos, active=active, gid=gid, overflow=overflow)
        halo_pos, halo_mask, h_ovf = halo_exchange(
            state.pos, state.active, axis, box_size, 2 * search_radius,
            halo_capacity)

        all_pos = jnp.concatenate([state.pos, halo_pos], axis=0)
        all_valid = jnp.concatenate([state.active, halo_mask], axis=0)
        clist = build_cell_list(all_pos, grid, cell_capacity, valid=all_valid)

        # query rows = local slots; inactive slots get a negative search
        # radius so they collect no neighbors
        q_radius = jnp.where(state.active, search_radius, -1.0).astype(dtype)
        nmat = _local_neighbor_rows(
            state.pos, jnp.arange(capacity, dtype=jnp.int32), all_pos, clist,
            q_radius, metric, max_neighbors)

        n_all = all_pos.shape[0]
        idxc = jnp.minimum(nmat.idx, n_all - 1)
        sep = metric.sep(state.pos[:, None, :], all_pos[idxc])
        r2 = jnp.maximum(jnp.sum(sep * sep, axis=-1), 1e-24)
        rinv = jax.lax.rsqrt(r2)
        d = r2 * rinv
        delta = jnp.where(nmat.mask, jnp.maximum(2 * radius - d, 0.0), 0.0)
        mag = (4.0 / 3.0) * e_eff * jnp.sqrt(radius / 2.0) * delta ** 1.5
        force = -jnp.sum((mag * rinv)[..., None] * sep, axis=1)

        vel = inv_drag * force
        if diffusion > 0:
            # per-global-id streams: migration/sharding invariant
            keys = jax.vmap(lambda g: jax.random.fold_in(jax.random.fold_in(key, step), g))(state.gid)
            z = jax.vmap(lambda k: jax.random.normal(k, (3,), dtype))(keys)
            vel = vel + jnp.sqrt(jnp.asarray(2.0 * diffusion / dt, dtype)) * z
        new_pos = metric.wrap(state.pos + jnp.asarray(dt, dtype) * vel)
        new_pos = jnp.where(state.active[:, None], new_pos, state.pos)

        pre_mig = ShardState(pos=new_pos, active=state.active, gid=state.gid,
                             overflow=jnp.asarray(False))
        post = migrate(pre_mig, axis, box_size)
        # diagnosable overflow bitmask: 1=halo, 2=cell, 4=nmat, 8=migration
        flags = (
            h_ovf.astype(jnp.int32)
            | (clist.overflow.astype(jnp.int32) << 1)
            | (nmat.overflow.astype(jnp.int32) << 2)
            | (post.overflow.astype(jnp.int32) << 3)
        )
        flags = jax.lax.pmax(flags, axis) | overflow
        max_overlap = jax.lax.pmax(jnp.max(delta), axis)
        return post.pos, post.active, post.gid, flags, max_overlap

    step_fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=(P(axis), P(axis), P(axis), P(), P()),
            check_vma=False,
        )
    )

    def init_fn(key):
        """Deal particles to shards by x-slab; returns global (D*C, ...)
        arrays sharded over `axis`."""
        pos = np.asarray(jax.random.uniform(key, (n_total, 3), dtype=dtype,
                                            maxval=box_size))
        width = box_size / n_dev
        owner = np.minimum((pos[:, 0] / width).astype(int), n_dev - 1)
        pos_slots = np.zeros((n_dev, capacity, 3), np.float32)
        act_slots = np.zeros((n_dev, capacity), bool)
        gid_slots = np.zeros((n_dev, capacity), np.int32)
        for d in range(n_dev):
            mine = np.where(owner == d)[0]
            if len(mine) > capacity:
                raise ValueError("slot capacity exceeded at init; raise slot_slack")
            pos_slots[d, : len(mine)] = pos[mine]
            act_slots[d, : len(mine)] = True
            gid_slots[d, : len(mine)] = mine
        sh = NamedSharding(mesh, P(axis))
        return (
            jax.device_put(pos_slots.reshape(-1, 3).astype(dtype), sh),
            jax.device_put(act_slots.reshape(-1), sh),
            jax.device_put(gid_slots.reshape(-1), sh),
            jnp.asarray(0, jnp.int32),  # overflow bitmask (0 = clean)
        )

    return step_fn, init_fn
