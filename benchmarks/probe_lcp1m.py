"""Isolate the lcp1m TPU worker crash: run each stage of the 1M LCP
pipeline with a readback fence + print between stages, so the last line
printed identifies the faulting stage. Usage:
  python -u benchmarks/probe_lcp1m.py [n] [steps_per_call]
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


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
spc = int(sys.argv[2]) if len(sys.argv) > 2 else 4
max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim

box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
log(f"n={n} box={box:.1f} max_iters={max_iters} devices={jax.devices()}")
sim = LCPSpheresSim(LCPSpheresConfig(
    num_spheres=n, box_size=float(box), radius=0.5, dt=1e-3,
    diffusion_coeff=0.1, max_col_iterations=max_iters))
sim.device_steps_per_call = spc
log("constructed")
t0 = time.perf_counter()
state = sim.init()
fence(state.pos)
log(f"init done in {time.perf_counter()-t0:.1f}s  "
    f"pair_cap={sim.pair_capacity} rows_k={sim.rows_k} "
    f"act_cap={sim.act_capacity} act_win={sim.act_window} "
    f"seg_win={sim.seg_window} act={int(state.act_count)} "
    f"ovf={bool(state.overflow)}")

# single inner step via the one-off step path first
t0 = time.perf_counter()
state = sim.step(state)
fence(state.pos)
log(f"step 1 (one-off) done in {time.perf_counter()-t0:.1f}s  "
    f"iters={int(state.lcp_iters)} res={float(state.lcp_residual):.2e}")

for blk in range(8):
    t0 = time.perf_counter()
    state = sim.run_block(state, spc)
    fence(state.pos)
    log(f"block {blk} ({spc} steps) done in {time.perf_counter()-t0:.1f}s  "
        f"iters={int(state.lcp_iters)} max={int(state.lcp_iters_max)} "
        f"act={int(state.act_count)} cap={sim.act_capacity} "
        f"win={sim.act_window} rebuilds={int(state.rebuild_count)} "
        f"ovf={bool(state.overflow)}")
log("PROBE OK")
