"""Isolate the steady-window vs ablation gap in the 1M LCP north star:
the bare fori loop of _inner_step measures ~130 ms/iter (ablate_lcp1m.py)
but the production _burst window measures ~200+ ms/step. Candidates:

  A. fori(_inner_step)                    — the ablation baseline
  B. while(done<k) of _inner_step         — loop FORM (while vs fori)
  C. while(done<k && !moved) (= _burst)   — + the skin-trigger cond
  D. fori(_inner_step + moved in body)    — the moved() reduction itself

Run: python benchmarks/ablate_burst.py [n] [buffer]
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


def timed(fn, state, n_loop, tag):
    out = fn(state)
    fence(out.pos)
    t0 = time.perf_counter()
    out = fn(state)
    fence(out.pos)
    dt = (time.perf_counter() - t0) / n_loop
    print(f"{tag:40s} {dt*1e3:9.2f} ms/step", flush=True)
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
    print(f"settled: act={int(state.act_count)} W={sim.act_window} "
          f"iters={int(state.lcp_iters)}", flush=True)

    K = 8
    skin_sq = jnp.asarray((0.5 * c.constraint_buffer) ** 2, sim.dtype)

    def moved(s):
        disp = sim.metric.sep(s.ref_pos, s.pos)
        return jnp.max(jnp.sum(disp * disp, axis=-1)) > skin_sq

    @jax.jit
    def run_fori(s):
        return jax.lax.fori_loop(0, K, lambda _, x: sim._inner_step(x), s)

    @jax.jit
    def run_while_plain(s):
        def cond(carry):
            x, done = carry
            return done < K

        def body(carry):
            x, done = carry
            return sim._inner_step(x), done + 1

        out, _ = jax.lax.while_loop(cond, body,
                                    (s, jnp.asarray(0, jnp.int32)))
        return out

    @jax.jit
    def run_while_moved(s):
        out, _ = sim._burst(s, K)
        return out

    @jax.jit
    def run_fori_moved(s):
        def body(_, x):
            x = sim._inner_step(x)
            # fold the moved() scalar into overflow so it is not dead code
            return x.replace(overflow=x.overflow & jnp.logical_not(moved(x)))

        return jax.lax.fori_loop(0, K, body, s)

    timed(run_fori, state, K, "A fori(_inner_step)")
    timed(run_while_plain, state, K, "B while(done<k)")
    timed(run_while_moved, state, K, "C while(done<k && !moved) [= _burst]")
    timed(run_fori_moved, state, K, "D fori(+moved in body)")
    # the production path for reference
    t0 = time.perf_counter()
    state2 = sim.run_block(state, 24, resize=False)
    fence(state2.pos)
    dt = (time.perf_counter() - t0) / 24
    print(f"{'run_block(24) production':40s} {dt*1e3:9.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
