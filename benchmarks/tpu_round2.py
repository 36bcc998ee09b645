"""Round-2 TPU measurements with readback fences (PERF.md methodology:
block_until_ready is not a fence on the tunneled runtime — every timing
ends with a scalar device->host readback).

Usage: python -u benchmarks/tpu_round2.py [phase ...]
Phases: spheres1m rods100k filaments lcp1m lcp100k chroma1m chroma262k
Prints one JSON line per phase as soon as it finishes.
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def spheres1m():
    from mundy_tpu.driver.apps.spheres import SpheresConfig
    from mundy_tpu.driver.apps.spheres_rows import RowSpheresSim

    n = 1_000_000
    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    sim = RowSpheresSim(SpheresConfig(
        num_spheres=n, box_size=float(box), radius=0.5,
        diffusion_coeff=0.1, dt=1e-4, skin=0.4))
    state = sim.init()
    state = sim.run_block(state, 2)
    fence(state.rows.pos)
    t0 = time.perf_counter()
    state = sim.run_block(state, 100)
    fence(state.rows.pos)
    dt = time.perf_counter() - t0
    emit(phase="spheres1m", steps_per_sec=100 / dt,
         overflow=bool(state.overflow))


def rods100k():
    # (N,K) engine with the component-planes narrow phase: at 5% volume
    # fraction the dense row engine scans ~1368 candidates/rod for ~7 real
    # neighbors (R=152 -> 8.9 steps/s); the compacted engine does the
    # narrow phase in 10.4 ms/step on-device (23+ steps/s through the
    # relax window including cell-list rebuilds)
    from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim

    n = 100_000
    vol = math.pi * 0.25**2 * 2.0 + (4 / 3) * math.pi * 0.25**3
    box = (n * vol / 0.05) ** (1 / 3)
    sim = RodsSim(RodsConfig(
        num_rods=n, box_size=float(box), diffusion_coeff=0.1,
        rot_diffusion_coeff=0.1, dt=1e-4, skin=0.4, dtype="float32",
        max_neighbors=32))
    state = sim.init()
    state = sim.run_block(state, 2)
    fence(state.pos)
    t0 = time.perf_counter()
    state = sim.run_block(state, 50)
    fence(state.pos)
    dt = time.perf_counter() - t0
    emit(phase="rods100k", steps_per_sec=50 / dt,
         rebuilds=int(state.rebuild_count), overflow=bool(state.overflow))


def filaments():
    from mundy_tpu.driver.apps.filaments import FilamentsConfig, FilamentsSim

    # keep filament arc length (M-1)*L = 49 under box/2 (app precondition:
    # min-image rod geometry needs filaments shorter than half the box)
    sim = FilamentsSim(FilamentsConfig(
        num_filaments=2000, nodes_per_filament=50, segment_length=1.0,
        radius=0.25, box_size=120.0, dtype="float32",
        diffusion_coeff=0.05))
    state = sim.init()
    state = sim.run_block(state, 2)
    fence(state.pos)
    t0 = time.perf_counter()
    state = sim.run_block(state, 50)
    fence(state.pos)
    dt = time.perf_counter() - t0
    emit(phase="filaments100k", steps_per_sec=50 / dt,
         engine=sim.contact_engine, overflow=bool(state.overflow))


def _lcp(n, steps_warm, steps_meas, tag):
    from mundy_tpu.driver.apps.lcp_spheres import (
        LCPSpheresConfig,
        LCPSpheresSim,
    )

    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    sim = LCPSpheresSim(LCPSpheresConfig(
        num_spheres=n, box_size=float(box), radius=0.5, dt=1e-3,
        diffusion_coeff=0.1))
    state = sim.init()
    t0 = time.perf_counter()
    state = sim.run_block(state, steps_warm)
    fence(state.pos)
    cold = time.perf_counter() - t0
    # settle blocks: let the active-set capacity resize (and its eager
    # recompile) land OUTSIDE the timed region — a shrink fires after the
    # relax, and its ~30-60 s compile would otherwise sit in the timing
    for _ in range(3):
        state = sim.run_block(state, 5)
    fence(state.pos)
    t0 = time.perf_counter()
    # resize=False: measure stepping at the settled capacities — a mid-
    # window capacity re-fit recompiles the fused program (~75 s at 1M)
    # and would otherwise dominate the 50-step timing
    state = sim.run_block(state, steps_meas, resize=False)
    fence(state.pos)
    dt = time.perf_counter() - t0
    emit(phase=tag, steps_per_sec=steps_meas / dt,
         cold_start_steps_per_sec=steps_warm / cold,
         lcp_iters=int(state.lcp_iters),
         lcp_iters_max=int(state.lcp_iters_max),
         act_count=int(state.act_count), act_capacity=sim.act_capacity,
         max_overlap=sim.max_overlap(state),
         overflow=bool(state.overflow))


def lcp1m():
    _lcp(1_000_000, 30, 50, "lcp1m")


def lcp100k():
    _lcp(100_000, 30, 100, "lcp100k")


def _chroma(chains, tag):
    from mundy_tpu.driver.apps.chromatin import ChromatinConfig, ChromatinSim

    n = chains * 512
    box = float((n / 0.285) ** (1 / 3))
    sim = ChromatinSim(ChromatinConfig(
        num_chains=chains, beads_per_chain=512,
        num_crosslinkers=n // 16, hydro="rpy_spectral", box_size=box,
        diffusion_coeff=0.05, dt=1e-4, dtype="float32"))
    state = sim.init()
    # regrow-aware warmup (an unrelaxed clustered init can overflow the
    # analytic capacity estimates; run_blocks drains that before stepping)
    from mundy_tpu.driver.regrow import run_blocks
    state = run_blocks(sim, state, 2, 2, log=lambda s: None)
    fence(state.pos)
    t0 = time.perf_counter()
    state = sim.run_block(state, 20)
    fence(state.pos)
    dt = time.perf_counter() - t0
    emit(phase=tag, steps_per_sec=20 / dt,
         G=sim.spectral.grid_n, P=sim.spectral.support,
         se_R=sim.se_geom.R, overflow=bool(state.overflow))


def chroma1m():
    _chroma(2048, "chromatin1m_spectral")


def chroma262k():
    _chroma(512, "chromatin262k_spectral")


ALL = {
    "spheres1m": spheres1m,
    "rods100k": rods100k,
    "filaments": filaments,
    "lcp1m": lcp1m,
    "lcp100k": lcp100k,
    "chroma1m": chroma1m,
    "chroma262k": chroma262k,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    emit(backend=jax.default_backend(),
         devices=[str(d) for d in jax.devices()])
    for name in names:
        try:
            t0 = time.perf_counter()
            ALL[name]()
        except Exception as e:  # keep going; report the failure
            emit(phase=name, error=f"{type(e).__name__}: {e}"[:2000])
