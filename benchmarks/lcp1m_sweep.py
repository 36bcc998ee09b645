"""Steady-state 1M LCP steps/s vs constraint_buffer (skin) on real TPU.

The skin trades rebuild frequency (interval ~ (skin / max-step-disp)^2)
against O(C) per-step costs (C ~ (2r + buffer)^3). Readback-fenced.
Usage: python -u benchmarks/lcp1m_sweep.py [buffer ...]
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


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def run(buffer: float, n=1_000_000, steps=30):
    from mundy_tpu.driver.apps.lcp_spheres import (LCPSpheresConfig,
                                                   LCPSpheresSim)

    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=0.1,
                         constraint_buffer=buffer)
    sim = LCPSpheresSim(c)
    state = sim.init()
    t0 = time.perf_counter()
    state = sim.run_block(state, 30)  # settle + compile
    fence(state.pos)
    settle = time.perf_counter() - t0
    rb0 = int(state.rebuild_count)
    t0 = time.perf_counter()
    state = sim.run_block(state, steps)
    fence(state.pos)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "buffer": buffer, "steps_per_sec": steps / dt,
        "rebuilds_per_30": int(state.rebuild_count) - rb0,
        "iters": int(state.lcp_iters), "act": int(state.act_count),
        "pair_capacity": sim.pair_capacity, "rows_k": sim.rows_k,
        "act_capacity": sim.act_capacity,
        "overflow": bool(state.overflow), "settle_s": settle,
    }), flush=True)


if __name__ == "__main__":
    buffers = [float(a) for a in sys.argv[1:]] or [0.2, 0.3, 0.4, 0.5]
    for b in buffers:
        run(b)
