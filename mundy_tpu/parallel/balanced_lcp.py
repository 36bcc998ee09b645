"""Density-balanced z-slab LCP: runtime load rebalance on the PRODUCTION
non-penetration pipeline (BASELINE config #2 physics, BBPGD solve).

The round-3 gap this closes: `balanced_slab.py` proved the quantile-slab
ownership design on a self-contained Hertzian settling demonstrator, but no
production engine consumed it — `slab_lcp`'s dense row layout is VOLUME-
allocated and cannot follow clustered density (the reference re-balances
the production mesh mid-run: `stk::balance::balanceStkMesh`,
`HP1...neigh_linker.cpp:820,1358`). This engine runs the LCP sphere
pipeline itself over COUNT-allocated compact slabs:

- ownership map = d+1 z-boundaries, DATA recomputed from the measured
  z-histogram at every skin rebuild (`balanced_bounds`): each slab owns
  ~N/d bodies regardless of clustering, so a settled bed or a Gaussian
  blob never overflows one shard's buffer while others sit empty;
- fully periodic box; slabs wrap in z (shard 0 and d-1 are ring
  neighbors), ghosts are the one-ring-hop halo within cutoff+skin of the
  slab's z-range by min-image distance;
- between rebuilds shards step locally: per-own-row (n_cap, K) neighbor
  matrix over the own+ghost compact buffer, per-step separations/normals
  from current positions (skin-buffered stale pair list, same contract as
  the single-device app), distributed BBPGD with psum'd inner products —
  each BBPGD iteration refreshes ghost VELOCITIES by the same two
  `ppermute`s that refresh ghost positions;
- pairs are directed (each contact appears on both owners' rows): the
  duplicated rows double both s^T y and s^T s in the BB step, leaving the
  step size and the fixed point unchanged — the same scheme `slab_lcp`
  validates against the single-device app;
- gamma warm-starts across steps within a skin period (the pair layout is
  frozen between rebuilds); rebuilds reset it (cold restarts there cost
  iterations, not correctness).

Trajectories match LCPSpheresSim to solver tolerance (LCP solutions are
generically unique); `tests/test_balanced_lcp.py` also reproduces the
`test_balanced_slab` acceptance shape: a clustered config that OVERFLOWS
uniform slabs completes balanced.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mundy_tpu.dynamics import brownian_velocity_keyed
from mundy_tpu.math.convex import PGDConfig, solve_lcp
from mundy_tpu.neighbor import build_cell_list, make_cell_grid, neighbor_matrix
from mundy_tpu.parallel.balanced_slab import balanced_bounds, uniform_bounds


def make_balanced_lcp_step(
    mesh: Mesh,
    axis: str,
    n_total: int,
    box_size: float,
    radius: float = 0.5,
    dt: float = 1e-3,
    viscosity: float = 1.0,
    diffusion_coeff: float = 0.0,
    constraint_buffer: float = 0.2,
    max_allowable_overlap: float = 1e-5,
    max_col_iterations: int = 1000,
    own_slack: float = 1.5,
    ghost_slack: float = 3.0,
    max_neighbors: int = 24,
    cell_capacity: int = 24,
    balance: str = "balanced",  # "balanced" | "uniform"
    dtype=jnp.float32,
):
    """Returns (init_fn, step_block_fn).

    init_fn(key, pos=None) -> sharded state dict; step_block_fn(state, n)
    runs n steps with skin-triggered rebalance+rebuild fully on-chip.
    """
    d = mesh.shape[axis]
    assert d >= 2
    L = float(box_size)
    cutoff = 2.0 * radius + constraint_buffer
    margin = cutoff + 0.5 * constraint_buffer
    n_cap = int(_math.ceil(own_slack * n_total / d / 8)) * 8
    g_cap = int(_math.ceil(ghost_slack * n_total / d / 8)) * 8
    m_tot = n_cap + g_cap
    K = max_neighbors
    inv_drag = 1.0 / (6.0 * _math.pi * viscosity * radius)
    two_r = 2.0 * radius
    grid = make_cell_grid([0, 0, 0], np.array([L, L, L]), cutoff,
                          (True,) * 3, dtype)
    perm_up = [(i, (i + 1) % d) for i in range(d)]
    perm_dn = [(i, (i - 1) % d) for i in range(d)]

    def _zdist(z, lo, hi):
        """Min-image distance from z to the slab range [lo, hi) (0 inside)."""
        below = jnp.minimum(jnp.abs(lo - z), jnp.abs(lo - z + L))
        above = jnp.minimum(jnp.abs(z - hi), jnp.abs(z - hi + L))
        inside = (z >= lo) & (z < hi)
        return jnp.where(inside, 0.0, jnp.minimum(below, above))

    def _repack(pos_all, shard_id):
        """Ownership + ghost halo for this shard from replicated positions:
        (own_idx, own_valid, ghost_idx, ghost_valid, ovf)."""
        zs = pos_all[:, 2]
        all_valid = jnp.ones((n_total,), bool)
        if balance == "balanced":
            bounds = balanced_bounds(zs, all_valid, d, 0.0, L)
        else:
            bounds = uniform_bounds(d, 0.0, L, dtype)
        b_lo = bounds[shard_id]
        b_hi = bounds[shard_id + 1]
        own = (zs >= b_lo) & (zs < b_hi)
        cum = jnp.cumsum(own.astype(jnp.int32))
        n_own = cum[n_total - 1]
        slot = jnp.where(own, jnp.minimum(cum - 1, n_cap), n_cap)
        own_idx = jnp.full((n_cap + 1,), n_total, jnp.int32).at[slot].set(
            jnp.arange(n_total, dtype=jnp.int32), mode="drop")[:n_cap]
        own_valid = own_idx < n_total
        ovf = n_own > n_cap
        # ghosts: within min-image margin of the slab's z-range, not own
        gh = (~own) & (_zdist(zs, b_lo, b_hi) < margin)
        gcum = jnp.cumsum(gh.astype(jnp.int32))
        n_gh = gcum[n_total - 1]
        gslot = jnp.where(gh, jnp.minimum(gcum - 1, g_cap), g_cap)
        ghost_idx = jnp.full((g_cap + 1,), n_total, jnp.int32).at[gslot].set(
            jnp.arange(n_total, dtype=jnp.int32), mode="drop")[:g_cap]
        ghost_valid = ghost_idx < n_total
        ovf = ovf | (n_gh > g_cap)
        # one-hop contract: every ghost is owned by a ring neighbor
        lo_prev = bounds[(shard_id - 1) % d]
        hi_prev = bounds[(shard_id - 1) % d + 1]
        lo_next = bounds[(shard_id + 1) % d]
        hi_next = bounds[(shard_id + 1) % d + 1]
        gz = zs[jnp.minimum(ghost_idx, n_total - 1)]
        in_prev = (gz >= lo_prev) & (gz < hi_prev)
        in_next = (gz >= lo_next) & (gz < hi_next)
        ovf = ovf | jnp.logical_not(
            jnp.all((~ghost_valid) | in_prev | in_next))
        return own_idx, own_valid, ghost_idx, ghost_valid, ovf

    def _ghost_sources(own_idx_prev, own_idx_next, ghost_idx):
        """Each ghost's (comes-from-prev?, slot in that neighbor's own
        buffer) — one ring hop by contract."""
        inv_prev = jnp.full((n_total + 1,), n_cap, jnp.int32).at[
            jnp.minimum(own_idx_prev, n_total)].set(
            jnp.arange(n_cap, dtype=jnp.int32), mode="drop")
        inv_next = jnp.full((n_total + 1,), n_cap, jnp.int32).at[
            jnp.minimum(own_idx_next, n_total)].set(
            jnp.arange(n_cap, dtype=jnp.int32), mode="drop")
        gi = jnp.minimum(ghost_idx, n_total)
        s_prev = inv_prev[gi]
        s_next = inv_next[gi]
        from_prev = s_prev < n_cap
        slot = jnp.where(from_prev, s_prev, s_next)
        found = from_prev | (s_next < n_cap)
        return from_prev, jnp.minimum(slot, n_cap - 1), found

    def _min_image(sep):
        return sep - L * jnp.round(sep * (1.0 / L))

    def local_block(pos_own, valid_own, gid_own, ghost_pos, ghost_from_prev,
                    ghost_slot, ghost_valid, ref_pos, nmat_idx, nmat_mask,
                    gamma, lcp_iters, key, step, overflow, n_steps):
        shard_id = jax.lax.axis_index(axis)

        def refresh_ghosts(val_own, gf_prev, gslot):
            """Ghost-slot values of any (n_cap, ...) own-slot array via the
            two ring permutes + the precomputed source-slot gather."""
            from_prev = jax.lax.ppermute(val_own, axis, perm_up)
            from_next = jax.lax.ppermute(val_own, axis, perm_dn)
            return jnp.where(
                gf_prev.reshape((-1,) + (1,) * (val_own.ndim - 1)),
                from_prev[gslot], from_next[gslot])

        def inner_step(carry):
            (pos_o, valid_o, gid_o, gpos, gf_prev, gslot, gvalid, ref,
             idxm, maskm, gam, iters, key, step, ovf, done) = carry
            gpos = refresh_ghosts(pos_o, gf_prev, gslot)
            pos_m = jnp.concatenate([pos_o, gpos], axis=0)
            idx = jnp.minimum(idxm, m_tot - 1)
            # per-step separations/normals from CURRENT positions
            sep = _min_image(pos_m[idx] - pos_o[:, None, :])
            d2 = jnp.maximum(jnp.sum(sep * sep, axis=-1), 1e-24)
            dist = jnp.sqrt(d2)
            normals = sep / dist[..., None]
            sep0 = dist - two_r

            u_b = None
            q = sep0
            if diffusion_coeff > 0:
                u_b = brownian_velocity_keyed(
                    key, step, jnp.where(valid_o, gid_o, 0),
                    jnp.asarray(diffusion_coeff, dtype), dt, dtype=dtype)
                u_b = jnp.where(valid_o[:, None], u_b, 0.0)
                ub_m = jnp.concatenate(
                    [u_b, refresh_ghosts(u_b, gf_prev, gslot)], axis=0)
                dub = u_b[:, None, :] - ub_m[idx]
                q = sep0 - jnp.asarray(dt, dtype) * jnp.sum(
                    normals * dub, axis=-1)

            def forces_of(g):
                gn = jnp.where(maskm, g.reshape(n_cap, K), 0.0)
                return jnp.sum(-gn[..., None] * normals, axis=1)

            def apply_A(g):
                u = inv_drag * forces_of(g)
                u = jnp.where(valid_o[:, None], u, 0.0)
                u_m = jnp.concatenate(
                    [u, refresh_ghosts(u, gf_prev, gslot)], axis=0)
                du = u[:, None, :] - u_m[idx]
                sdot = -jnp.sum(normals * du, axis=-1)
                return (jnp.asarray(dt, dtype) * sdot).reshape(-1)

            cfg = PGDConfig(max_iters=max_col_iterations,
                            tol=max_allowable_overlap,
                            bb_rule="alternating",
                            residual="projected_gradient",
                            axis_names=(axis,))
            res = solve_lcp(apply_A, q.reshape(-1), x0=gam, config=cfg,
                            mask=maskm.reshape(-1))
            gam = res.x
            vel = inv_drag * forces_of(gam)
            if u_b is not None:
                vel = vel + u_b
            new_pos = pos_o + jnp.asarray(dt, dtype) * vel
            new_pos = new_pos - L * jnp.floor(new_pos * (1.0 / L))
            new_pos = jnp.where(valid_o[:, None], new_pos, pos_o)
            iters = jnp.full_like(iters, res.num_iters)
            return (new_pos, valid_o, gid_o, gpos, gf_prev, gslot, gvalid,
                    ref, idxm, maskm, gam, iters, key, step + 1, ovf,
                    done + 1)

        def moved(carry):
            pos_o, valid_o = carry[0], carry[1]
            ref = carry[7]
            disp = _min_image(pos_o - ref)
            d2 = jnp.where(valid_o, jnp.sum(disp * disp, axis=-1), 0.0)
            return jax.lax.pmax(jnp.max(d2), axis) > \
                (0.5 * constraint_buffer) ** 2

        def rebuild(carry):
            (pos_o, valid_o, gid_o, _gpos, _gfp, _gslot, _gvalid, _ref,
             _idx, _mask, _gam, iters, key, step, ovf, done) = carry
            contrib = jnp.zeros((n_total, 3), dtype).at[
                jnp.where(valid_o, gid_o, n_total)].set(
                jnp.where(valid_o[:, None], pos_o, 0.0), mode="drop")
            pos_all = jax.lax.psum(contrib, axis)
            own_idx, own_valid, ghost_idx, ghost_valid, rovf = _repack(
                pos_all, shard_id)
            safe = jnp.minimum(own_idx, n_total - 1)
            new_pos = jnp.where(own_valid[:, None], pos_all[safe], 0.0)
            new_gid = jnp.where(own_valid, own_idx, n_total)
            idx_prev = jax.lax.ppermute(own_idx, axis, perm_up)
            idx_next = jax.lax.ppermute(own_idx, axis, perm_dn)
            gf_prev, gslot, found = _ghost_sources(idx_prev, idx_next,
                                                   ghost_idx)
            rovf = rovf | jnp.logical_not(jnp.all((~ghost_valid) | found))
            gpos = jnp.where(ghost_valid[:, None],
                             pos_all[jnp.minimum(ghost_idx, n_total - 1)],
                             0.0)
            # park invalid own/ghost slots far apart (cell lists drop them
            # via the valid mask; parked coordinates never enter pairs)
            pos_m = jnp.concatenate([new_pos, gpos], axis=0)
            valid_m = jnp.concatenate([own_valid, ghost_valid], axis=0)
            clist = build_cell_list(pos_m, grid, cell_capacity,
                                    valid=valid_m)
            from mundy_tpu.geom import periodic
            metric = periodic(np.array([L, L, L]), dtype=dtype)
            nmat = neighbor_matrix(
                pos_m, clist, jnp.asarray(0.5 * cutoff, dtype),
                metric=metric, max_neighbors=K, chunk=min(4096, m_tot))
            idxm = nmat.idx[:n_cap]
            maskm = (nmat.mask[:n_cap]
                     & own_valid[:, None]
                     & valid_m[jnp.minimum(idxm, m_tot - 1)])
            rovf = rovf | clist.overflow | nmat.overflow
            gam = jnp.zeros((n_cap * K,), dtype)
            return (new_pos, own_valid, new_gid, gpos, gf_prev, gslot,
                    ghost_valid, new_pos, idxm, maskm, gam, iters, key,
                    step, ovf | rovf, done)

        def outer_body(carry):
            carry = jax.lax.cond(moved(carry), rebuild, lambda c: c, carry)
            carry = inner_step(carry)

            # skin trigger computed in the BODY, carried as a flag the
            # cond reads (a while cond can't fuse with the body and runs
            # its pmax as a separate program; ablate_burst.py)
            def inner_step_flag(cf):
                c, _ = cf
                c = inner_step(c)
                return (c, moved(c))

            carry, _ = jax.lax.while_loop(
                lambda cf: jnp.logical_and(cf[0][-1] < n_steps,
                                           jnp.logical_not(cf[1])),
                inner_step_flag, (carry, moved(carry)))
            return carry

        carry = (pos_own, valid_own, gid_own, ghost_pos, ghost_from_prev,
                 ghost_slot, ghost_valid, ref_pos, nmat_idx, nmat_mask,
                 gamma, lcp_iters, key, step, overflow,
                 jnp.asarray(0, jnp.int32))
        carry = jax.lax.while_loop(lambda c: c[-1] < n_steps, outer_body,
                                   carry)
        return carry[:15]

    sharded = NamedSharding(mesh, P(axis))
    names = ("pos", "valid", "gid", "gpos", "gf_prev", "gslot", "gvalid",
             "ref_pos", "nmat_idx", "nmat_mask", "gamma", "lcp_iters",
             "key", "step", "overflow")

    def init_fn(key, pos=None):
        """key: PRNGKey; pos: optional (N, 3) initial positions (random
        uniform if None). Returns the sharded state dict."""
        if pos is None:
            pos = jax.random.uniform(key, (n_total, 3), dtype=dtype,
                                     minval=0.0, maxval=L)
        pos = jnp.asarray(pos, dtype)

        def shard_init(pos_rep, key_rep):
            shard_id = jax.lax.axis_index(axis)
            own_idx, own_valid, ghost_idx, ghost_valid, ovf = _repack(
                pos_rep, shard_id)
            safe = jnp.minimum(own_idx, n_total - 1)
            pos_o = jnp.where(own_valid[:, None], pos_rep[safe], 0.0)
            gid_o = jnp.where(own_valid, own_idx, n_total)
            idx_prev = jax.lax.ppermute(own_idx, axis, perm_up)
            idx_next = jax.lax.ppermute(own_idx, axis, perm_dn)
            gf_prev, gslot, found = _ghost_sources(idx_prev, idx_next,
                                                   ghost_idx)
            ovf = ovf | jnp.logical_not(jnp.all((~ghost_valid) | found))
            gpos = jnp.where(ghost_valid[:, None],
                             pos_rep[jnp.minimum(ghost_idx, n_total - 1)],
                             0.0)
            # fresh pair layout (identical to rebuild())
            pos_m = jnp.concatenate([pos_o, gpos], axis=0)
            valid_m = jnp.concatenate([own_valid, ghost_valid], axis=0)
            clist = build_cell_list(pos_m, grid, cell_capacity,
                                    valid=valid_m)
            from mundy_tpu.geom import periodic
            metric = periodic(np.array([L, L, L]), dtype=dtype)
            nmat = neighbor_matrix(
                pos_m, clist, jnp.asarray(0.5 * cutoff, dtype),
                metric=metric, max_neighbors=K, chunk=min(4096, m_tot))
            idxm = nmat.idx[:n_cap]
            maskm = (nmat.mask[:n_cap]
                     & own_valid[:, None]
                     & valid_m[jnp.minimum(idxm, m_tot - 1)])
            ovf = ovf | clist.overflow | nmat.overflow
            return (pos_o, own_valid, gid_o, gpos, gf_prev, gslot,
                    ghost_valid, pos_o, idxm, maskm,
                    jnp.zeros((n_cap * K,), dtype),
                    jnp.zeros((), jnp.int32), key_rep,
                    jnp.zeros((), jnp.int32), ovf)

        out = jax.jit(jax.shard_map(
            lambda p, k: tuple(v[None] for v in shard_init(p[0], k[0])),
            mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(axis),) * 15, check_vma=False))(
            pos[None], key[None])
        return dict(zip(names, out))

    # jitted step programs memoized per n_steps: rebuilding the
    # jit(shard_map(...)) wrapper per call re-traces every invocation
    # (round-4 advisor finding) — the cache makes repeat blocks hit the
    # compiled executable directly, mirroring lcp_spheres' _burst_jit.
    _step_cache: dict = {}

    def _make_step(n_steps: int):
        def shard_step(*vals):
            s = [v[0] for v in vals]
            out = local_block(*s, jnp.asarray(n_steps, jnp.int32))
            return tuple(v[None] for v in out)

        return jax.jit(jax.shard_map(
            shard_step, mesh=mesh, in_specs=(P(axis),) * 15,
            out_specs=(P(axis),) * 15, check_vma=False))

    def step_block_fn(state, n_steps: int):
        f = _step_cache.get(n_steps)
        if f is None:
            f = _step_cache[n_steps] = _make_step(n_steps)
        out = f(*[state[k] for k in names])
        return dict(zip(names, out))

    return init_fn, step_block_fn
