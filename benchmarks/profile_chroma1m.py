"""Component-level profile of the 1M-bead spectral chromatin step on TPU.

Times each phase with on-device loops and readback fences (PERF.md
methodology). Run: python benchmarks/profile_chroma1m.py [chains]
"""

from __future__ import annotations

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


def timeit(fn, *args, iters=3, tag=""):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:44s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def main(chains=2048):
    from mundy_tpu.driver.apps.chromatin import ChromatinConfig, ChromatinSim
    from mundy_tpu.driver.regrow import run_blocks

    n = chains * 512
    box = float((n / 0.285) ** (1 / 3))
    sim = ChromatinSim(ChromatinConfig(
        num_chains=chains, beads_per_chain=512,
        num_crosslinkers=n // 16, hydro="rpy_spectral", box_size=box,
        diffusion_coeff=0.05, dt=1e-4, dtype="float32"))
    state = sim.init()
    state = run_blocks(sim, state, 2, 2, log=lambda s: None)
    fence(state.pos)
    print(f"N={n} G={sim.spectral.grid_n} P={sim.spectral.support} "
          f"se_R={sim.se_geom.R} r_cut={sim.spectral.base.r_cut:.2f}",
          flush=True)

    pos = state.pos
    f0 = jnp.zeros_like(pos).at[:, 0].set(1e-3)

    timeit(jax.jit(sim._kmc), state, tag="KMC sweep")
    timeit(jax.jit(sim._forces), state, tag="forces (FENE+contact+xl)")

    from mundy_tpu.neighbor.cells3d import build_cells3d
    from mundy_tpu.ops.pallas.se_grid import (SEGridTiles, se_spread_tiles,
                                              se_interp_tiles)
    from mundy_tpu.mobility.ewald import ewald_real_apply_cells
    from mundy_tpu.mobility.spectral import _k_apply, se_bin_geom

    assert isinstance(sim.se_geom, SEGridTiles)
    print(f"tiles: m={sim.se_geom.m} R={sim.se_geom.R} "
          f"cells_cap={sim.hydro_cells_grid.capacity}", flush=True)
    timeit(jax.jit(lambda p: se_bin_geom(sim.se_geom, p, sim.dtype)),
           pos, tag="se_bin_tiles (per step)")
    pieces = se_bin_geom(sim.se_geom, pos, sim.dtype)
    timeit(jax.jit(lambda p: build_cells3d(p, sim.hydro_cells_grid)),
           pos, tag="build_cells3d (per step)")
    cells = build_cells3d(pos, sim.hydro_cells_grid)
    timeit(jax.jit(lambda f: ewald_real_apply_cells(
        sim.spectral.base, cells, f, (sim.config.box_size,) * 3)),
        f0, tag="real-space apply (plain cells3d)")
    if sim.hydro_split is not None:
        from mundy_tpu.neighbor.cells3d import (build_cells3d_split,
                                                pair_apply_cells3d_split)
        from mundy_tpu.mobility.ewald import rpy_real_cells_kernel
        c_ex, dc_cap = sim.hydro_split
        print(f"split: c_lo={sim.hydro_split_grid.capacity} "
              f"c_ex={c_ex} dc_cap={dc_cap}", flush=True)
        kern = rpy_real_cells_kernel(sim.spectral.base)

        def real_split(p, f):
            split = build_cells3d_split(p, sim.hydro_split_grid,
                                        c_ex, dc_cap)
            return pair_apply_cells3d_split(
                split, (sim.config.box_size,) * 3, f, kern, 3)
        timeit(jax.jit(real_split), pos, f0,
               tag="real-space split (build+apply)")

    # the wave chain as ONE jit: a (G, G, G, 3) jit boundary tile-pads the
    # minor axis of 3 to 128 lanes — 32.7 GB at G=400 (the (M, 3) rule)
    def wave(f):
        grid = se_spread_tiles(sim.se_geom, pieces, f)
        ugrid = _k_apply(sim.spectral, grid)
        return se_interp_tiles(sim.se_geom, pieces, ugrid.astype(sim.dtype))
    timeit(jax.jit(wave), f0, tag="wave apply (spread+FFT+interp fused)")

    def wave_fft(t):
        # build/consume the (G, G, G, 3) grid INSIDE the jit — that shape
        # crossing the boundary tile-pads the minor axis 42x (32.7 GB)
        G = sim.spectral.grid_n
        g = jnp.full((G, G, G, 3), 1e-6, sim.dtype) * (1.0 + 0.0 * t)
        return jnp.sum(_k_apply(sim.spectral, g)[0, 0, 0])
    timeit(jax.jit(wave_fft), jnp.asarray(0.0, sim.dtype),
           tag="  k_apply alone (FFT+screen+iFFT)")

    t0 = time.perf_counter()
    state = sim.run_block(state, 4)
    fence(state.pos)
    print(f"{'full step (4-step block)':44s} "
          f"{(time.perf_counter()-t0)/4*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
