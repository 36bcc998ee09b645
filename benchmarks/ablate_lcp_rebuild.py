"""Component ablation of the 1M LCP REBUILD (the co-dominant steady cost
after round-4's 129.8 ms inner step): rows broad phase, ordered pair list,
segment windows, dual slots, gamma remap — timed as fused prefixes.

Run: python benchmarks/ablate_lcp_rebuild.py [n] [buffer]
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

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
from mundy_tpu.neighbor import build_pair_list_ordered
from mundy_tpu.ops.segments import segment_windows
from mundy_tpu.neighbor.rows import neighbor_matrix_rows
from mundy_tpu.constraints.collision import (body_pair_starts,
                                             pair_dual_slots)
from mundy_tpu.constraints import remap_gamma


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
    print(f"{tag:44s} {dt*1e3:9.2f} ms", flush=True)
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
    print(f"settled: C={sim.pair_capacity} rows_k={sim.rows_k} "
          f"slack={sim.rows_slack:.2f}", flush=True)

    def feed(s, v):
        return s.replace(pos=s.pos + 0.0 * v * s.pos[0, 0])

    def st_rows(s):
        nmat = neighbor_matrix_rows(
            s.pos, float(sim.search_radius), (c.box_size,) * 3,
            max_neighbors=min(c.max_neighbors, sim.rows_k),
            capacity_slack=sim.rows_slack,
            search_radii=sim.search_radii)
        return feed(s, jnp.sum(nmat.idx[:1, :1].astype(jnp.float32)))

    def mk_nmat(s):
        return neighbor_matrix_rows(
            s.pos, float(sim.search_radius), (c.box_size,) * 3,
            max_neighbors=min(c.max_neighbors, sim.rows_k),
            capacity_slack=sim.rows_slack,
            search_radii=sim.search_radii)

    def st_pairs(s):
        nmat = mk_nmat(s)
        pairs = build_pair_list_ordered(nmat, sim.pair_capacity)
        return feed(s, jnp.sum(pairs.i[:1].astype(jnp.float32)))

    def st_windows(s):
        nmat = mk_nmat(s)
        pairs = build_pair_list_ordered(nmat, sim.pair_capacity)
        starts = body_pair_starts(nmat)
        seg = segment_windows(pairs.i, c.num_spheres, sim.seg_block,
                              sim.seg_window, body_starts=starts)
        dual_full, _miss = pair_dual_slots(pairs, starts, nmat)
        return feed(s, jnp.sum(seg.starts[:1].astype(jnp.float32))
                    + jnp.sum(dual_full[:1].astype(jnp.float32)))

    def st_remap(s):
        nmat = mk_nmat(s)
        pairs = build_pair_list_ordered(nmat, sim.pair_capacity)
        gfull_old = jnp.zeros((sim.pair_capacity,), sim.dtype)
        gfull_old = gfull_old.at[s.gamma_sel].set(
            jnp.where(s.gamma_sel < sim.pair_capacity, s.gamma, 0.0),
            mode="drop")
        gamma_full = remap_gamma(s.pairs, gfull_old, pairs,
                                 probes=sim._pair_run_bound(),
                                 old_starts=body_pair_starts(s.nmat),
                                 old_nmat=s.nmat)
        return feed(s, jnp.sum(gamma_full[:1]))

    def st_full(s):
        return sim._rebuild(s)

    loop_time(st_rows, state, 6, "rows broad phase (nmat)")
    loop_time(st_pairs, state, 6, "rows + ordered pair list")
    loop_time(st_windows, state, 6, "rows + pairs + windows + dual")
    loop_time(st_remap, state, 6, "rows + pairs + gamma remap")
    loop_time(st_full, state, 6, "full _rebuild")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
