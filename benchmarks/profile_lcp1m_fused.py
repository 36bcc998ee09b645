"""Where does the FUSED 1M LCP run program spend its time?

profile_lcp1m.py measures parts (inner step 228 ms, rebuild 423 ms) that sum
to ~13 s for a 30-step steady window, but run_block measures 92 s — a 7x
fused-program penalty. This times _run_jit at several trip counts and the
rebuild/inner programs in isolation to locate it. Readback-fenced.
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


def main(n=1_000_000):
    from mundy_tpu.driver.apps.lcp_spheres import (LCPSpheresConfig,
                                                   LCPSpheresSim)

    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=0.1)
    sim = LCPSpheresSim(c)
    state = sim.init()
    print(f"n={n} C={sim.pair_capacity} A={sim.act_capacity} "
          f"rows_k={sim.rows_k} act_window={sim.act_window}", flush=True)
    t0 = time.perf_counter()
    state = sim.run_block(state, 30)
    fence(state.pos)
    print(f"settle 30: {time.perf_counter()-t0:.1f}s "
          f"iters_max={int(state.lcp_iters_max)}", flush=True)

    if not hasattr(sim, "_run_jit"):
        sim._run_jit = jax.jit(sim._run_n)

    # trip-count scan: marginal per-step cost of the fused program
    for k in (0, 1, 2, 4, 8, 16):
        st = sim._run_jit(state, jnp.asarray(k, jnp.int32))
        fence(st.pos)
        reps = 3
        t0 = time.perf_counter()
        rb = 0
        for _ in range(reps):
            st = sim._run_jit(state, jnp.asarray(k, jnp.int32))
            rb += int(st.rebuild_count) - int(state.rebuild_count)
            fence(st.pos)
        dt = (time.perf_counter() - t0) / reps
        print(f"_run_jit(k={k:2d})  {dt*1e3:9.1f} ms  "
              f"({dt*1e3/max(k,1):7.1f} ms/step, rebuilds/call={rb/reps:.1f})",
              flush=True)

    # single-step program (cond rebuild) for comparison
    st = sim._step_jit(state)
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(5):
        st = sim._step_jit(st)
        fence(st.pos)
    print(f"_step_jit x5: {(time.perf_counter()-t0)/5*1e3:.1f} ms/step",
          flush=True)

    # rebuild + inner step standalone (same state)
    rb = jax.jit(sim._rebuild)
    st = rb(state)
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(3):
        st = rb(state)
        fence(st.pos)
    print(f"_rebuild: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

    inner = jax.jit(sim._inner_step)
    st = inner(state)
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(5):
        st = inner(st)
        fence(st.pos)
    print(f"_inner_step chained x5: {(time.perf_counter()-t0)/5*1e3:.1f} "
          "ms/step", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
