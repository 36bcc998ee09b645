"""Strong-scaling harness: Brownian spheres over 1..D devices.

Mirrors the reference harness
(`scrap/parameter_interface/alens/tests/performance_tests/
mundy_brownian_strongscaling.yaml` — npart sweeps x node counts): fixed
total particle count, device count swept over the mesh, tps recorded per
configuration. Run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
to emulate a slice, or on a real multi-chip TPU topology.

Usage: python benchmarks/strong_scaling.py [--npart 100000] [--steps 50]
Prints one JSON line per (n_devices, npart).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# honor JAX_PLATFORMS=cpu even though sitecustomize preloads JAX on the
# axon TPU platform before env vars can take effect (the virtual-mesh
# sweep needs the forced host device count, which only exists on cpu)
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_one(n_devices: int, npart: int, steps: int, box: float) -> dict:
    """Drives the FLAGSHIP sharded engine (parallel/slab_rows.py: z-slab
    row layout, ppermute halos, fused nested-while run loop) — the same
    engine dryrun_multichip validates and the row bench measures."""
    from jax.sharding import Mesh
    from mundy_tpu.parallel.slab_rows import make_slab_rows_spheres_step

    devs = jax.devices()[:n_devices]
    mesh = Mesh(devs, ("shard",))
    init_fn, step_fn, _grid = make_slab_rows_spheres_step(
        mesh, "shard", n_total=npart, box_size=box, radius=0.5,
        youngs=1000.0, diffusion=0.1, dt=1e-4, skin=0.4)
    state = init_fn(jax.random.PRNGKey(0))

    # warmup/compile
    state = step_fn(state, 1)
    # scalar readback: block_until_ready returns early on the tunneled
    # axon runtime; only a device->host transfer is a reliable fence
    float(jnp.ravel(state["pos"])[0])

    t0 = time.perf_counter()
    state = step_fn(state, steps)
    float(jnp.ravel(state["pos"])[0])
    elapsed = time.perf_counter() - t0
    return {
        "n_devices": n_devices,
        "npart": npart,
        "steps": steps,
        "engine": "slab_rows",
        "tps": steps / elapsed,
        "particle_steps_per_sec": npart * steps / elapsed,
        "overflow": bool(state["overflow"]),
    }


def run_one_lcp(n_devices: int, npart: int, steps: int, box: float) -> dict:
    """Drives THE sharded LCP engine (parallel/balanced_lcp.py:
    count-allocated density-balanced z-slabs, distributed BBPGD) — the
    production --devices N route for the lcp_spheres app. n_devices == 1
    falls back to the single-device app (the engine's shard topology
    needs >= 2 slabs), which is the honest 1-device baseline: it is what
    a 1-chip user actually runs."""
    t_label = "balanced_lcp"
    if n_devices == 1:
        from mundy_tpu.driver.apps.lcp_spheres import (LCPSpheresConfig,
                                                       LCPSpheresSim)
        cfg = LCPSpheresConfig(num_spheres=npart, box_size=box, radius=0.5,
                               dt=1e-3, diffusion_coeff=0.1,
                               constraint_buffer=0.4)
        sim = LCPSpheresSim(cfg)
        state = sim.init()
        state = sim.run_block(state, 4)  # settle/compile
        float(jnp.ravel(state.pos)[0])
        t0 = time.perf_counter()
        state = sim.run_block(state, steps, resize=False)
        float(jnp.ravel(state.pos)[0])
        elapsed = time.perf_counter() - t0
        overflow = bool(state.overflow)
        t_label = "lcp_spheres(app)"
    else:
        from jax.sharding import Mesh
        from mundy_tpu.parallel.balanced_lcp import make_balanced_lcp_step

        devs = jax.devices()[:n_devices]
        mesh = Mesh(devs, ("shard",))
        init_fn, step_fn = make_balanced_lcp_step(
            mesh, "shard", n_total=npart, box_size=box, radius=0.5,
            dt=1e-3, diffusion_coeff=0.1, constraint_buffer=0.4)
        state = init_fn(jax.random.PRNGKey(0))
        state = step_fn(state, 4)  # settle/compile
        float(jnp.ravel(state["pos"])[0])
        t0 = time.perf_counter()
        state = step_fn(state, steps)
        float(jnp.ravel(state["pos"])[0])
        elapsed = time.perf_counter() - t0
        overflow = bool(jnp.any(state["overflow"]))
    return {
        "n_devices": n_devices,
        "npart": npart,
        "steps": steps,
        "engine": t_label,
        "tps": steps / elapsed,
        "particle_steps_per_sec": npart * steps / elapsed,
        "overflow": overflow,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npart", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--devices", type=int, nargs="*", default=None,
                    help="device counts to sweep (default: 1,2,4,...,all)")
    ap.add_argument("--engine", choices=("rows", "lcp", "both"),
                    default="rows")
    args = ap.parse_args()

    total = len(jax.devices())
    counts = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= total]
    # box for phi = 5%
    box = (args.npart * (4 / 3) * 3.141592653589793 * 0.125 / 0.05) ** (1 / 3)
    for d in counts:
        if args.engine in ("rows", "both"):
            print(json.dumps(run_one(d, args.npart, args.steps, box)),
                  flush=True)
        if args.engine in ("lcp", "both"):
            print(json.dumps(run_one_lcp(d, args.npart, args.steps, box)),
                  flush=True)


if __name__ == "__main__":
    main()
