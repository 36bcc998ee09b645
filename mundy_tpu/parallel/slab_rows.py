"""Sharded row-grid engine: z-slab decomposition of the gather-free layout.

Combines the two fastest designs: the dense row engine (neighbor/rows.py,
zero irregular access on the hot path) sharded over a device mesh by z-plane
slabs. Per step each shard:

1. exchanges ONE boundary z-plane with each ring neighbor via `lax.ppermute`
   (the aura/ghosting analog — O(ny * R) halo vs O(N) all-gather);
2. runs the 9-offset pair stencil on its halo-extended local block — y stays
   periodic via jnp.roll, z neighbors become static slices of the extended
   block (min-image metrics fix the wrapped coordinates of the global
   boundary planes);
3. integrates its local particles (gid-keyed Brownian streams: trajectories
   identical to the single-chip row engine).

Rebuild (skin-triggered, decided globally via pmax) re-sorts GLOBALLY:
all-gather the flat positions, rebuild rows, slice the local slab — particle
migration across slabs is subsumed by the resort, exactly like slot
migration within the single-chip row rebuild.
"""

from __future__ import annotations

import math as _math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mundy_tpu.forces.contact import effective_youngs, hertzian_pair_force
from mundy_tpu.geom import periodic
from mundy_tpu.neighbor.rows import RowGrid, build_rows, make_row_grid, rows_to_flat


def make_slab_rows_spheres_step(
    mesh: Mesh,
    axis: str,
    n_total: int,
    box_size: float,
    radius: float = 0.5,
    youngs: float = 1000.0,
    poisson: float = 0.3,
    viscosity: float = 1.0,
    diffusion: float = 0.1,
    dt: float = 1e-4,
    skin: float = 0.4,
    capacity_slack: float = 1.9,
    dtype=jnp.float32,
):
    """Returns (init_fn, step_block_fn).

    init_fn(key) -> state dict of sharded arrays.
    step_block_fn(state, n_steps) -> state: runs n_steps with skin-triggered
    global rebuilds, fully on-chip (nested while inside shard_map).
    """
    d = mesh.shape[axis]
    metric = periodic(np.array([box_size] * 3), dtype=dtype)
    cutoff = 2 * radius + skin
    grid = make_row_grid([0, 0, 0], [box_size] * 3, cutoff, n_total,
                         capacity_slack=capacity_slack, dtype=dtype)
    # make nz divisible by the mesh axis
    nz = (grid.nz // d) * d
    if nz < d:
        raise ValueError("too few z-planes for the mesh axis")
    grid = RowGrid(origin=grid.origin,
                   cell_yz=grid.cell_yz.at[1].set(box_size / nz),
                   ny=grid.ny, nz=nz, row_capacity=grid.row_capacity)
    nzl = nz // d
    R = grid.row_capacity
    ny = grid.ny
    inv_drag = 1.0 / (6.0 * _math.pi * viscosity * radius)
    e_eff = effective_youngs(youngs, youngs, poisson, poisson)
    box = (float(box_size),) * 3

    def _forces_local(pos_ext, valid_ext):
        """9-offset stencil on the halo-extended block (ny, nzl+2, R, 3)."""
        own_p = pos_ext[:, 1:1 + nzl]
        own_v = valid_ext[:, 1:1 + nzl]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
        force = jnp.zeros_like(own_p)
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cand_p = pos_ext[:, 1 + dz:1 + dz + nzl]
                cand_v = valid_ext[:, 1 + dz:1 + dz + nzl]
                if dy != 0:
                    cand_p = jnp.roll(cand_p, -dy, axis=0)
                    cand_v = jnp.roll(cand_v, -dy, axis=0)
                sep = metric.sep(own_p[..., :, None, :], cand_p[..., None, :, :])
                r2 = jnp.maximum(jnp.sum(sep * sep, axis=-1), 1e-24)
                rinv = jax.lax.rsqrt(r2)
                dist = r2 * rinv
                delta = jnp.maximum(2 * radius - dist, 0.0)
                mag = (4.0 / 3.0) * e_eff * jnp.sqrt(0.5 * radius * delta) * delta
                mask = own_v[..., :, None] & cand_v[..., None, :]
                if dy == 0 and dz == 0:
                    mask = mask & (slot[..., :, None] != slot[..., None, :])
                w = jnp.where(mask, mag * rinv, 0.0)
                force = force - jnp.sum(w[..., None] * sep, axis=3)
        return force

    def local_block(pos, valid, gid, ref_pos, overflow, key, n_steps):
        """shard_map body: run n_steps with rebuilds. All arrays local
        (ny, nzl, R, ...)."""
        perm_up = [(i, (i + 1) % d) for i in range(d)]
        perm_dn = [(i, (i - 1) % d) for i in range(d)]
        target = n_steps

        def halo_ext(p, v):
            lo = jax.lax.ppermute(p[:, -1:], axis, perm_up)  # from left nbr
            hi = jax.lax.ppermute(p[:, :1], axis, perm_dn)  # from right nbr
            vlo = jax.lax.ppermute(v[:, -1:], axis, perm_up)
            vhi = jax.lax.ppermute(v[:, :1], axis, perm_dn)
            return (jnp.concatenate([lo, p, hi], axis=1),
                    jnp.concatenate([vlo, v, vhi], axis=1))

        def inner_step(carry):
            pos, valid, gid, ref_pos, key, step, done = carry
            pos_ext, valid_ext = halo_ext(pos, valid)
            f = _forces_local(pos_ext, valid_ext)
            vel = inv_drag * f
            if diffusion > 0:
                z_flat = jax.random.normal(jax.random.fold_in(key, step),
                                           (n_total, 3), dtype=dtype)
                z = z_flat[jnp.minimum(gid, n_total - 1)]
                z = jnp.where(valid[..., None], z, 0.0)
                vel = vel + jnp.sqrt(jnp.asarray(2 * diffusion / dt, dtype)) * z
            new_pos = metric.wrap(pos + jnp.asarray(dt, dtype) * vel)
            new_pos = jnp.where(valid[..., None], new_pos, pos)
            return (new_pos, valid, gid, ref_pos, key, step + 1, done + 1)

        def moved(carry):
            pos, valid, _gid, ref_pos, _key, _step, _done = carry
            disp = metric.sep(ref_pos, pos)
            d2 = jnp.where(valid, jnp.sum(disp * disp, axis=-1), 0.0)
            return jax.lax.pmax(jnp.max(d2), axis) > (0.5 * skin) ** 2

        def rebuild(carry):
            pos, valid, gid, _ref, key, step, done = carry
            # global resort: gather flat positions by gid, rebuild, reslice
            flat_local = jnp.zeros((n_total, 3), dtype)
            idx = jnp.where(valid.reshape(-1), gid.reshape(-1), n_total)
            flat_local = flat_local.at[idx].set(pos.reshape(-1, 3), mode="drop")
            flat = jax.lax.psum(flat_local, axis)
            rows = build_rows(flat, jnp.arange(n_total, dtype=jnp.int32), grid)
            me = jax.lax.axis_index(axis)
            z0 = me * nzl
            new_pos = jax.lax.dynamic_slice_in_dim(rows.pos, z0, nzl, axis=1)
            new_val = jax.lax.dynamic_slice_in_dim(rows.valid, z0, nzl, axis=1)
            new_gid = jax.lax.dynamic_slice_in_dim(rows.gid, z0, nzl, axis=1)
            return (new_pos, new_val, new_gid, new_pos, key, step, done)

        def outer_body(carry_ovf):
            carry, ovf = carry_ovf
            carry = rebuild(carry)
            carry = inner_step(carry)
            carry = jax.lax.while_loop(
                lambda c: jnp.logical_and(c[6] < target, jnp.logical_not(moved(c))),
                inner_step, carry)
            return (carry, ovf)

        carry = (pos, valid, gid, ref_pos, key,
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        (carry, overflow) = jax.lax.while_loop(
            lambda co: co[0][6] < target, outer_body, (carry, overflow))
        pos, valid, gid, ref_pos, _key, _step, _done = carry
        return pos, valid, gid, ref_pos, overflow

    step_block = jax.jit(
        jax.shard_map(
            local_block, mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, axis),
                      P(None, axis), P(), P(), P()),
            out_specs=(P(None, axis), P(None, axis), P(None, axis),
                       P(None, axis), P()),
            check_vma=False,
        )
    )

    def init_fn(key):
        kp, ks = jax.random.split(key)
        pos = jax.random.uniform(kp, (n_total, 3), dtype=dtype, maxval=box_size)
        rows = build_rows(pos, jnp.arange(n_total, dtype=jnp.int32), grid)
        sh = NamedSharding(mesh, P(None, axis))
        return {
            "pos": jax.device_put(np.asarray(rows.pos), sh),
            "valid": jax.device_put(np.asarray(rows.valid), sh),
            "gid": jax.device_put(np.asarray(rows.gid), sh),
            "ref_pos": jax.device_put(np.asarray(rows.pos), sh),
            "overflow": jnp.asarray(bool(rows.overflow)),
            "key": ks,
        }

    def step_block_fn(state, n_steps):
        pos, valid, gid, ref, ovf = step_block(
            state["pos"], state["valid"], state["gid"], state["ref_pos"],
            state["overflow"], state["key"], jnp.asarray(n_steps, jnp.int32))
        return {**state, "pos": pos, "valid": valid, "gid": gid,
                "ref_pos": ref, "overflow": ovf}

    return init_fn, step_block_fn, grid
