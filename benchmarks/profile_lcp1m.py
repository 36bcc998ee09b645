"""Component-level profile of the 1M-body LCP step on real TPU.

Times each piece of the per-step pipeline with on-device fori loops and
readback fences (PERF.md methodology). Run: python benchmarks/profile_lcp1m.py [n]
"""

from __future__ import annotations

import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(fn, *args, iters=8, inner=None, tag=""):
    """Time fn(*args); if inner is set, fn must be loopable on device."""
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:40s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def loop_time(make_body, n_loop, tag, arg):
    """On-device fori loop around body to avoid tunnel RTT per call."""

    @jax.jit
    def run(a):
        def body(_, carry):
            return make_body(carry)
        return jax.lax.fori_loop(0, n_loop, body, a)

    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n_loop
    print(f"{tag:40s} {dt*1e3:9.2f} ms/iter  (x{n_loop} on-device)", flush=True)
    return dt


def main(n=1_000_000):
    from mundy_tpu.constraints.collision import (
        active_pair_subset,
        collision_forces,
        collision_setup_spheres,
        _sep_rate,
    )
    from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
    from mundy_tpu.mobility import local_drag_mobility
    from mundy_tpu.ops.segments import segment_windows

    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=0.1,
                         constraint_buffer=float(__import__('os').environ.get('LCP_BUFFER', 0.2)))
    sim = LCPSpheresSim(c)
    state = sim.init()
    print(f"n={n} pair_capacity={sim.pair_capacity} act_capacity={sim.act_capacity} "
          f"act_window={sim.act_window} seg_window={sim.seg_window}")
    t0 = time.perf_counter()
    state = sim.run_block(state, 30)  # settle to steady state
    fence(state.pos)
    rb0 = int(state.rebuild_count)
    print(f"30-step settle: {time.perf_counter()-t0:.1f} s "
          f"iters_max={int(state.lcp_iters_max)} act={int(state.act_count)} "
          f"ovf={bool(state.overflow)} rebuilds={rb0}", flush=True)
    t0 = time.perf_counter()
    state = sim.run_block(state, 30)
    fence(state.pos)
    print(f"steady 30 steps: {time.perf_counter()-t0:.1f} s  "
          f"rebuilds={int(state.rebuild_count) - rb0}/30  "
          f"iters={int(state.lcp_iters)}", flush=True)
    print(f"act_capacity now {sim.act_capacity} window {sim.act_window}",
          flush=True)

    pos = state.pos
    pairs = state.pairs
    radius = jnp.asarray(c.radius, sim.dtype)
    dtype = sim.dtype

    # --- step-level parts ---
    setup_full, _ = timeit(
        jax.jit(lambda p: collision_setup_spheres(p, radius, pairs,
                                                  metric=sim.metric)),
        pos, tag="setup_full (sep/normals over C)")

    from mundy_tpu.constraints.collision import active_pair_subset_strided

    compact = jax.jit(lambda sf: active_pair_subset_strided(
        sf, sim._dyn_margin(sf), n, sim.seg_block, sim.act_window,
        state.seg_starts, dual_full=state.dual_full,
        prev=(state.prev_cum, state.gamma, sim.act_window),
        gamma_full=state.gamma_full))
    res_act, _ = timeit(compact, setup_full,
                        tag="active_pair_subset_strided (+dual+warm)")
    setup_act, sel, n_act, blk_max = (res_act.setup, res_act.sel,
                                      res_act.n_act, res_act.block_max)
    dual_act = res_act.dual
    print(f"   n_act={int(n_act)} of C={sim.pair_capacity} "
          f"A={sim.act_capacity} blk_max={int(blk_max)}")
    # jit outputs turn the NamedTuple's static ints into arrays; rebuild
    # with python ints so downstream jit sees static block/window sizes
    from mundy_tpu.ops.segments import StridedWindows
    windows = StridedWindows(block_bodies=sim.seg_block,
                             window=sim.act_window, nb=sim.nb_blocks,
                             overflow=setup_act.windows.overflow)
    setup_act = setup_act._replace(windows=windows)

    gamma = jnp.where(setup_act.pairs.mask,
                      jnp.abs(jax.random.normal(jax.random.PRNGKey(0),
                                                setup_act.sep0.shape,
                                                dtype)), 0.0)

    # --- per-iteration parts, on-device loops ---
    loop_time(lambda g: 0.999 * g + 0.001 * jnp.mean(
        collision_forces(setup_act, g, n)), 32, "collision_forces (D gamma)", gamma)

    mob = sim._mobility(pos, state.hydro_nmat)[0]
    f0 = collision_forces(setup_act, gamma, n)
    loop_time(lambda f: 0.999 * f + 0.001 * jnp.mean(mob(f)), 32,
              "mobility (local drag)", f0)
    u0 = mob(f0)
    loop_time(lambda u: 0.999 * u + 0.001 * jnp.mean(
        _sep_rate(setup_act, u)), 32, "_sep_rate (J^T U)", u0)

    dt_s = jnp.asarray(c.dt, dtype)

    def apply_A(g):
        f = collision_forces(setup_act, g, n)
        u = mob(f)
        return dt_s * _sep_rate(setup_act, u)

    loop_time(lambda g: 0.999 * g + 0.001 * apply_A(g), 32,
              "apply_A (full Delassus)", gamma)

    # fused block-local apply (scalar mobility): one VMEM one-hot kernel
    # + one (A,) dual gather per iteration
    from mundy_tpu.constraints.collision import make_local_drag_apply
    mob_c = 1.0 / (6.0 * 3.141592653589793 * c.viscosity * c.radius)
    fused = make_local_drag_apply(setup_act, dual_act, n, c.dt,
                                  mobility_i=jnp.asarray(mob_c, dtype),
                                  mobility_j=jnp.asarray(mob_c, dtype))
    loop_time(lambda g: 0.999 * g + 0.001 * fused(g), 32,
              "apply_A fused (strided_t + dual)", gamma)

    # assembled block-Delassus apply (matvec + dual gather per iteration)
    from mundy_tpu.constraints.collision import (assemble_block_delassus,
                                                 make_block_delassus_apply)
    timeit(jax.jit(lambda t: assemble_block_delassus(
        setup_act._replace(sep0=setup_act.sep0 + 0.0 * t))),
        jnp.asarray(0.0, dtype), iters=4,
        tag="assemble_block_delassus (per step)")
    # M as an ARGUMENT (baking the (nb, W, W) constant into the program
    # overflows the remote-compile request at 1M)
    M = jax.jit(lambda t: assemble_block_delassus(
        setup_act._replace(sep0=setup_act.sep0 + 0.0 * t)))(
        jnp.asarray(0.0, dtype))
    nb_, W_ = M.shape[0], M.shape[1]
    n_slots = nb_ * W_
    dual_c = jnp.minimum(dual_act, n_slots - 1)
    dt_s = jnp.asarray(c.dt, dtype)
    mobc = jnp.asarray(mob_c, dtype)

    def blk_apply(Mv, g):
        gg = jnp.where(setup_act.pairs.mask, g, 0.0)
        u = jnp.einsum("bpq,bq->bp", Mv, gg.reshape(nb_, W_),
                       precision=jax.lax.Precision.HIGHEST).reshape(n_slots)
        return dt_s * mobc * (u + u[dual_c])

    @jax.jit
    def mv_loop(Mv, g):
        def body(_, gg):
            return 0.999 * gg + 0.001 * blk_apply(Mv, gg)
        return jax.lax.fori_loop(0, 32, body, g)

    out = mv_loop(M, gamma); fence(out)
    t0 = time.perf_counter(); out = mv_loop(M, gamma); fence(out)
    print(f"{'apply_A block-matvec (M gamma + dual)':40s} "
          f"{(time.perf_counter()-t0)/32*1e3:9.2f} ms/iter", flush=True)

    # the full solve at forced iteration counts with the block apply
    from mundy_tpu.math.convex import PGDConfig, solve_lcp
    for K in (8, 15):
        cfg_s = PGDConfig(max_iters=K, tol=1e-12, bb_rule="alternating",
                          residual="projected_gradient")

        @jax.jit
        def solve_loop(Mv, g):
            def body(_, gg):
                r = solve_lcp(lambda x: blk_apply(Mv, x), setup_act.sep0,
                              x0=gg, config=cfg_s,
                              mask=setup_act.pairs.mask)
                return 0.999 * gg + 0.001 * r.x
            return jax.lax.fori_loop(0, 4, body, g)

        out = solve_loop(M, gamma); fence(out)
        t0 = time.perf_counter(); out = solve_loop(M, gamma); fence(out)
        print(f"{f'solve_only({K} iters, block apply)':40s} "
              f"{(time.perf_counter()-t0)/4*1e3:9.2f} ms/solve", flush=True)

    # solver-iteration overhead: dots + residual + projections
    def iter_overhead(g):
        gg = jnp.where(setup_act.pairs.mask, g, 0.0)
        d1 = jnp.sum(gg * gg)
        d2 = jnp.sum(gg * (gg + 1))
        d3 = jnp.sum((gg + 1) ** 2)
        r = jnp.max(jnp.where(setup_act.pairs.mask, jnp.abs(gg), 0.0))
        return 0.999 * g + 0.001 * (d1 + d2 + d3 + r)

    loop_time(iter_overhead, 32, "iteration dots+residual", gamma)

    # the actual solve at the steady-state iteration count
    from mundy_tpu.constraints.collision import resolve_collisions

    def solve_k(k):
        def run(s):
            setup_f = collision_setup_spheres(s.pos, radius, s.pairs,
                                              metric=sim.metric)
            su = active_pair_subset_strided(
                setup_f, sim._dyn_margin(setup_f), n, sim.seg_block,
                sim.act_window, s.seg_starts).setup
            g0 = jnp.zeros((sim.act_capacity,), dtype)
            _g, vel, res = resolve_collisions(
                su, mob, n, c.dt, max_allowable_overlap=c.max_allowable_overlap,
                max_iterations=k, gamma0=g0)
            return s.replace(lcp_residual=res.residual)
        return run

    for k in (1, 6, 12):
        timeit(jax.jit(solve_k(k)), state, iters=3,
               tag=f"setup+compact+solve(max_iters={k})")

    # full inner step
    loop_time(lambda s: sim._inner_step(s), 8, "full _inner_step", state)

    # rebuild (broad phase + gamma remap) and its decomposition
    timeit(jax.jit(sim._rebuild), state, iters=3, tag="_rebuild (broad+remap)")

    from mundy_tpu.constraints.collision import remap_gamma
    from mundy_tpu.neighbor import build_pair_list_ordered, neighbor_matrix_rows

    c = sim.config
    rows_fn = jax.jit(lambda p: neighbor_matrix_rows(
        p, float(sim.search_radius), (c.box_size,) * 3,
        max_neighbors=min(c.max_neighbors, sim.rows_k),
        capacity_slack=sim.rows_slack))
    nmat, _ = timeit(rows_fn, pos, iters=3, tag="  neighbor_matrix_rows")
    plist_fn = jax.jit(lambda nm: build_pair_list_ordered(nm, sim.pair_capacity))
    new_pairs, _ = timeit(plist_fn, nmat, iters=3, tag="  build_pair_list_ordered")
    timeit(jax.jit(lambda pi: segment_windows(pi, n, sim.seg_block,
                                              sim.seg_window)),
           new_pairs.i, iters=3, tag="  segment_windows (full)")
    gfull = jnp.zeros((sim.pair_capacity,), sim.dtype)
    timeit(jax.jit(lambda g: remap_gamma(state.pairs, g, new_pairs,
                                         probes=sim._pair_run_bound())),
           gfull, iters=3, tag="  remap_gamma")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
