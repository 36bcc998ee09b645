"""Skin-buffer sweep for the 1M LCP config: steady steps/s vs buffer.

Rebuild cadence scales ~buffer^2 (diffusive trigger) while per-step fixed
costs scale with pair capacity ~ (2r+buffer)^3 — this measures the trade.
Run: python benchmarks/sweep_lcp_buffer.py [n] [buffers...]
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


def main():
    args = sys.argv[1:]
    n = int(args[0]) if args else 1_000_000
    buffers = [float(b) for b in args[1:]] or [0.2, 0.4, 0.6]
    from mundy_tpu.driver.apps.lcp_spheres import (LCPSpheresConfig,
                                                   LCPSpheresSim)

    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    for buf in buffers:
        c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                             dt=1e-3, diffusion_coeff=0.1,
                             constraint_buffer=buf)
        sim = LCPSpheresSim(c)
        state = sim.init()
        t0 = time.perf_counter()
        state = sim.run_block(state, 30)  # settle
        float(jnp.sum(state.pos[0]))
        settle = time.perf_counter() - t0
        rb0 = int(state.rebuild_count)
        t0 = time.perf_counter()
        state = sim.run_block(state, 30)
        float(jnp.sum(state.pos[0]))
        dt = time.perf_counter() - t0
        print(f"buffer={buf:.2f}  C={sim.pair_capacity} A={sim.act_capacity} "
              f"W={sim.act_window} K={sim.rows_k}  settle={settle:.1f}s  "
              f"steady={30/dt:.2f} steps/s  "
              f"rebuilds={int(state.rebuild_count)-rb0}/30  "
              f"iters={int(state.lcp_iters)} "
              f"max={int(state.lcp_iters_max)}  "
              f"act={int(state.act_count)}  ovf={bool(state.overflow)}",
              flush=True)


if __name__ == "__main__":
    main()
