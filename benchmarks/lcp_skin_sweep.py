"""Sweep the LCP skin (constraint_buffer) at fixed active margin: the
rebuild trigger is max-displacement > skin/2, and at 1M bodies the
1M-sample displacement tail crosses 0.1 every ~2 steps — rebuilds then
cost ~211 ms/step amortized. A wider skin pays a bigger pair list +
per-step setup for a ~4x longer cadence. Readback-fenced steady windows.

Usage: python -u benchmarks/lcp_skin_sweep.py [n] [buffer ...]
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


n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
buffers = [float(b) for b in sys.argv[2:]] or [0.2, 0.35, 0.5]

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim

box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
for buf in buffers:
    sim = LCPSpheresSim(LCPSpheresConfig(
        num_spheres=n, box_size=float(box), radius=0.5, dt=1e-3,
        diffusion_coeff=0.1, constraint_buffer=buf, active_margin=0.1))
    state = sim.init()
    state = sim.run_block(state, 30)
    fence(state.pos)
    for _ in range(3):
        state = sim.run_block(state, 5)
    fence(state.pos)
    rb0 = int(state.rebuild_count)
    t0 = time.perf_counter()
    state = sim.run_block(state, 50, resize=False)
    fence(state.pos)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "buffer": buf, "steps_per_sec": 50 / dt,
        "rebuilds_per_50": int(state.rebuild_count) - rb0,
        "iters": int(state.lcp_iters),
        "iters_max": int(state.lcp_iters_max),
        "act": int(state.act_count), "act_cap": sim.act_capacity,
        "pair_cap": sim.pair_capacity, "rows_k": sim.rows_k,
        "max_overlap": sim.max_overlap(state),
        "overflow": bool(state.overflow)}), flush=True)
