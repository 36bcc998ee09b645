"""Per-pair cost of the ellipsoid narrow phase on TPU (PGD multistart +
L-BFGS chart polish) — the production path of the rods app's
shape="ellipsoid" option. Run: python benchmarks/ellipsoid_bench.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def main(n=20000):
    cfg = RodsConfig(num_rods=n, box_size=float(max(40.0, (n / 8.0) ** (1 / 3) * 6)),
                     radius=0.25, length=1.5, shape="ellipsoid",
                     engine="nmat", dt=2e-4, dtype="float32",
                     ellipsoid_pgd_iters=24, ellipsoid_refine_iters=8)
    sim = RodsSim(cfg)
    state = sim.init()
    fence(state.pos)

    @jax.jit
    def narrow(s):
        def body(_, x):
            f, tau, _nrm = sim._contact_forces_torques_ellipsoid(
                x.pos, x.quat, x.nmat)
            return x.replace(pos=x.pos + 0.0 * f)
        return jax.lax.fori_loop(0, 8, body, s)

    out = narrow(state); fence(out.pos)
    t0 = time.perf_counter(); out = narrow(state); fence(out.pos)
    dt = (time.perf_counter() - t0) / 8
    pairs = n * cfg.max_neighbors
    print(json.dumps({
        "metric": "ellipsoid narrow phase (PGD24 + LBFGS8, cold)",
        "n": n, "ms_per_step": 1e3 * dt,
        "candidate_pairs": pairs,
        "ns_per_candidate_pair": 1e9 * dt / pairs,
    }))

    # temporal warm start: seed from the persisted slot normals, single
    # start, reduced PGD budget (the production between-rebuild path)
    @jax.jit
    def narrow_warm(s):
        def body(_, x):
            f, tau, nrm = sim._contact_forces_torques_ellipsoid(
                x.pos, x.quat, x.nmat, warm_n=x.warm_n)
            return x.replace(pos=x.pos + 0.0 * f, warm_n=nrm)
        return jax.lax.fori_loop(0, 8, body, s)

    out = narrow_warm(state); fence(out.pos)
    t0 = time.perf_counter(); out = narrow_warm(state); fence(out.pos)
    dtw = (time.perf_counter() - t0) / 8
    print(json.dumps({
        "metric": f"ellipsoid narrow phase (warm PGD{cfg.ellipsoid_warm_pgd_iters} + LBFGS8)",
        "n": n, "ms_per_step": 1e3 * dtw,
        "candidate_pairs": pairs,
        "ns_per_candidate_pair": 1e9 * dtw / pairs,
        "speedup_vs_cold": dt / dtw,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
