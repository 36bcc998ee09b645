"""Isolate the fused-loop overhead: the same settled 1M LCP state stepped by
(a) fori_loop of _inner_step (static count, no skin check),
(b) while_loop with done<target only (dynamic count, no skin check),
(c) the production _burst (dynamic count + per-iteration moved() check),
all timed with readback fences over 12 steps.

Run: python benchmarks/probe_burst.py [n] [buffer]
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
    K = 12

    @jax.jit
    def run_fori(s):
        return jax.lax.fori_loop(0, K, lambda _, x: sim._inner_step(x), s)

    @jax.jit
    def run_while(s):
        def cond(carry):
            return carry[1] < K
        def body(carry):
            return sim._inner_step(carry[0]), carry[1] + 1
        out, _ = jax.lax.while_loop(cond, body,
                                    (s, jnp.asarray(0, jnp.int32)))
        return out

    burst = jax.jit(sim._burst)

    def timeit(fn, s, tag, reps=2):
        out = fn(s)
        fence(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(s)
            fence(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps / K
        print(f"{tag:36s} {dt*1e3:8.1f} ms/step", flush=True)

    timeit(run_fori, state, "fori(_inner_step) x12")
    timeit(run_while, state, "while(done<12) no skin check")
    timeit(lambda s: burst(s, jnp.asarray(K, jnp.int32))[0], state,
           "production _burst(12)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
