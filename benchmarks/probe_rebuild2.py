"""Single-call rebuild cost on an EVOLVING state (the ablation's fori over
an identical input understates it), plus observed burst lengths.

Run: python benchmarks/probe_rebuild2.py [n] [buffer]
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

    burst = jax.jit(sim._burst)
    rebuild = jax.jit(sim._rebuild)

    # RTT reference: a trivial jitted op
    triv = jax.jit(lambda s: s.pos[0, 0] + 1.0)
    fence(triv(state))
    t0 = time.perf_counter()
    for _ in range(4):
        fence(triv(state))
    rtt = (time.perf_counter() - t0) / 4
    print(f"RTT floor: {rtt*1e3:.1f} ms", flush=True)

    # walk several rebuild periods, timing each phase single-call
    for period in range(5):
        t0 = time.perf_counter()
        state, d = burst(state, jnp.asarray(16, jnp.int32))
        d = int(d)
        t_burst = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = rebuild(state)
        fence(state.pos)
        t_reb = time.perf_counter() - t0
        per_step = (t_burst - rtt) / max(d, 1)
        print(f"period {period}: burst d={d} {t_burst*1e3:7.1f} ms "
              f"({per_step*1e3:6.1f} ms/step)  rebuild {t_reb*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
