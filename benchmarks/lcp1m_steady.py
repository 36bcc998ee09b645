"""Steady-state 1M LCP steps/s with a clean measurement window.

Settles from the random start, then times a window of steps with
resize/recompile excluded (run_block(resize=False); capacities frozen after
the settle). Sweeps the constraint buffer — the skin that sets the rebuild
period against the Brownian displacement tail.

Run: python benchmarks/lcp1m_steady.py [n] [buffers...]
"""

from __future__ import annotations

import json
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


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def measure(n, buffer, settle=24, window=24, diffusion=0.1):
    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=diffusion,
                         constraint_buffer=buffer)
    sim = LCPSpheresSim(c)
    t0 = time.perf_counter()
    state = sim.init()
    fence(state.pos)
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    # settle in chunks so the active-window resize (hysteresis: a shrink
    # needs two consecutive blocks demanding it) can land before timing
    for _ in range(3):
        state = sim.run_block(state, settle // 3 + 1)
        fence(state.pos)
    t_settle = time.perf_counter() - t0
    rb0 = int(state.rebuild_count)
    # record then clear the sticky overflow noted during the pre-resize
    # settle blocks (capacities have been re-fit since; a real overflow in
    # the warm block or the timed window re-raises it)
    settle_overflow = bool(state.overflow)
    state = state.replace(overflow=jnp.asarray(False))
    # warm the frozen-capacity program (one chunk) before timing
    state = sim.run_block(state, 2, resize=False)
    fence(state.pos)
    rb0 = int(state.rebuild_count)
    t0 = time.perf_counter()
    state = sim.run_block(state, window, resize=False)
    fence(state.pos)
    dt = time.perf_counter() - t0
    out = {
        "n": n, "buffer": buffer,
        "steps_per_sec": window / dt,
        "ms_per_step": 1e3 * dt / window,
        "rebuilds_per_step": (int(state.rebuild_count) - rb0) / window,
        "iters_last": int(state.lcp_iters),
        "iters_max": int(state.lcp_iters_max),
        "act_count": int(state.act_count),
        "act_window": sim.act_window,
        "pair_capacity": sim.pair_capacity,
        "overflow": bool(state.overflow),
        "settle_overflow": settle_overflow,
        "t_init_s": round(t_init, 1), "t_settle_s": round(t_settle, 1),
    }
    if out["overflow"]:
        # overflow-source breakdown (which capacity tripped)
        nmat, pairs, hmat, seg_starts, dual_full, _ = sim._broad_phase(state.pos)
        print(json.dumps({
            "overflow_sources": {
                "nmat": bool(nmat.overflow),
                "pairs": bool(pairs.overflow),
                "act_block_max_vs_W": [int(state.act_block_max),
                                       sim.act_window],
            }}), flush=True)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    buffers = ([float(b) for b in sys.argv[2:]] if len(sys.argv) > 2
               else [0.2, 0.35, 0.5])
    for b in buffers:
        measure(n, b)
