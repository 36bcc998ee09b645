"""Per-step probe of the steady 1M LCP window: step-by-step _step() calls
with readback fences (RTT-inflated by ~26 ms each, constant) to expose the
variance the fused-window aggregate hides — which steps are slow, and what
lcp_iters they ran.

Run: python benchmarks/probe_lcp_steps.py [n] [buffer]
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


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


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
    # reset the iters_max stat so it reflects only the probed window
    state = state.replace(lcp_iters_max=jnp.zeros_like(state.lcp_iters_max))

    # single fused step program (rebuild-on-trigger + one inner step)
    run1 = jax.jit(sim._run_n)
    state = run1(state, jnp.asarray(1, jnp.int32))
    fence(state.pos)

    for k in range(26):
        rb0 = int(state.rebuild_count)
        t0 = time.perf_counter()
        state = run1(state, jnp.asarray(1, jnp.int32))
        fence(state.pos)
        dt = time.perf_counter() - t0
        print(f"step {k:2d}: {dt*1e3:7.1f} ms  iters={int(state.lcp_iters):3d} "
              f"rebuilt={int(state.rebuild_count) - rb0} "
              f"act={int(state.act_count)}", flush=True)

    # and the fused 24-step window for the honest aggregate
    t0 = time.perf_counter()
    state = sim.run_block(state, 24, resize=False)
    fence(state.pos)
    dt = time.perf_counter() - t0
    print(f"fused 24-step window: {dt/24*1e3:.1f} ms/step "
          f"({24/dt:.2f} steps/s) iters_max={int(state.lcp_iters_max)}",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
