"""In-situ ablation of the 1M LCP step: time PREFIXES of the real
_inner_step pipeline with on-device fori loops (readback-fenced), so each
stage's cost is measured inside one fused program — per-call timings
through the tunnel overstate small stages by RTT + launch overhead.

Run: python benchmarks/ablate_lcp1m.py [n] [buffer]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mundy_tpu.constraints.collision import (
    active_pair_subset_strided,
    assemble_band_delassus,
    collision_forces,
    collision_setup_spheres,
    make_band_delassus_apply,
    _sep_rate,
)
from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
from mundy_tpu.dynamics import brownian_velocity_keyed, euler_step
from mundy_tpu.math.convex import PGDConfig, solve_lcp


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def loop_time(fn, arg, n_loop, tag):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, n_loop, lambda _, c: fn(c), a)

    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n_loop
    print(f"{tag:44s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main(n=1_000_000, buffer=0.45):
    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=0.1,
                         constraint_buffer=buffer)
    sim = LCPSpheresSim(c)
    state = sim.init()
    for _ in range(3):
        state = sim.run_block(state, 9)
        fence(state.pos)
    state = sim.run_block(state, 2, resize=False)
    fence(state.pos)
    print(f"settled: C={sim.pair_capacity} A={sim.act_capacity} "
          f"W={sim.act_window} rows_k={sim.rows_k} "
          f"slack={sim.rows_slack:.2f} act={int(state.act_count)} "
          f"iters={int(state.lcp_iters)}", flush=True)

    radius = jnp.asarray(c.radius, sim.dtype)
    dt_s = jnp.asarray(c.dt, sim.dtype)
    mob_c = jnp.asarray(1.0 / (6.0 * math.pi * c.viscosity * c.radius),
                        sim.dtype)
    k_band = sim._pair_run_bound()

    # each stage consumes the previous stages' outputs and feeds a tiny
    # perturbation back into pos so the loop carries a real dependency
    def feed(s, v):
        return s.replace(pos=s.pos + 0.0 * v * s.pos[0, 0])

    def st_setup(s):
        su = collision_setup_spheres(s.pos, radius, s.pairs,
                                     metric=sim.metric)
        return feed(s, jnp.sum(su.sep0[:1]))

    def compact(s, su):
        return active_pair_subset_strided(
            su, sim._dyn_margin(su), n, sim.seg_block, sim.act_window,
            s.seg_starts, dual_full=s.dual_full,
            prev=(s.prev_cum, s.gamma, sim.act_window),
            gamma_full=s.gamma_full)

    def st_compact(s):
        su = collision_setup_spheres(s.pos, radius, s.pairs,
                                     metric=sim.metric)
        act = compact(s, su)
        return feed(s, jnp.sum(act.setup.sep0[:1]) + jnp.sum(act.gamma0[:1]))

    def st_band(s):
        su = collision_setup_spheres(s.pos, radius, s.pairs,
                                     metric=sim.metric)
        act = compact(s, su)
        band = assemble_band_delassus(act.setup, k_band)
        return feed(s, jnp.sum(band[:, :1]))

    def st_q(s):
        su = collision_setup_spheres(s.pos, radius, s.pairs,
                                     metric=sim.metric)
        act = compact(s, su)
        u_ext = brownian_velocity_keyed(
            s.key, s.step, jnp.arange(n, dtype=jnp.int32),
            jnp.asarray(c.diffusion_coeff, sim.dtype), c.dt,
            dtype=sim.dtype)
        q = act.setup.sep0 + dt_s * _sep_rate(act.setup, u_ext)
        return feed(s, jnp.sum(q[:1]))

    def solve_k(k):
        def st(s):
            su = collision_setup_spheres(s.pos, radius, s.pairs,
                                         metric=sim.metric)
            act = compact(s, su)
            u_ext = brownian_velocity_keyed(
                s.key, s.step, jnp.arange(n, dtype=jnp.int32),
                jnp.asarray(c.diffusion_coeff, sim.dtype), c.dt,
                dtype=sim.dtype)
            q = act.setup.sep0 + dt_s * _sep_rate(act.setup, u_ext)
            apply_A = make_band_delassus_apply(act.setup, act.dual, c.dt,
                                               k_band, mobility_i=mob_c,
                                               mobility_j=mob_c)
            cfg = PGDConfig(max_iters=k, tol=c.max_allowable_overlap,
                            bb_rule="alternating",
                            residual="projected_gradient")
            res = solve_lcp(apply_A, q, x0=act.gamma0, config=cfg,
                            mask=act.setup.pairs.mask, alpha0=s.lcp_alpha)
            return feed(s, jnp.sum(res.x[:1]))
        return st

    def st_final(s):
        """solve(1) + the final velocity/Euler tail (F assembly + drag)."""
        su = collision_setup_spheres(s.pos, radius, s.pairs,
                                     metric=sim.metric)
        act = compact(s, su)
        u_ext = brownian_velocity_keyed(
            s.key, s.step, jnp.arange(n, dtype=jnp.int32),
            jnp.asarray(c.diffusion_coeff, sim.dtype), c.dt,
            dtype=sim.dtype)
        q = act.setup.sep0 + dt_s * _sep_rate(act.setup, u_ext)
        apply_A = make_band_delassus_apply(act.setup, act.dual, c.dt,
                                           k_band, mobility_i=mob_c,
                                           mobility_j=mob_c)
        cfg = PGDConfig(max_iters=1, tol=c.max_allowable_overlap,
                        bb_rule="alternating",
                        residual="projected_gradient")
        res = solve_lcp(apply_A, q, x0=act.gamma0, config=cfg,
                        mask=act.setup.pairs.mask, alpha0=s.lcp_alpha)
        vel = mob_c * collision_forces(act.setup, res.x, n) + u_ext
        new_pos = euler_step(s.pos, vel, dt_s, metric=sim.metric)
        return feed(s, jnp.sum(new_pos[:1]))

    loop_time(st_setup, state, 16, "setup_full")
    loop_time(st_compact, state, 16, "setup + compact(+dual+warm)")
    loop_time(st_band, state, 16, "setup + compact + band assemble")
    loop_time(st_q, state, 16, "setup + compact + noise + q")
    loop_time(solve_k(1), state, 16, "... + solve(max_iters=1)")
    loop_time(solve_k(8), state, 8, "... + solve(max_iters=8)")
    loop_time(solve_k(15), state, 8, "... + solve(max_iters=15)")
    loop_time(st_final, state, 8, "... + solve(1) + final vel/Euler")
    loop_time(lambda s: sim._inner_step(s), state, 8, "full _inner_step")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
