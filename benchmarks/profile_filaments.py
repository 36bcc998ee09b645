"""Component profile for the 2000x50 filaments benchmark config.

Phases timed separately with readback fences: rebuild (_build_nmat),
contact narrow phase, rod internal forces, full inner step, and the fused
run loop — to locate the cost that pins the app at ~30 steps/s.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mundy_tpu.driver.apps.filaments import FilamentsConfig, FilamentsSim


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        fence(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    sim = FilamentsSim(FilamentsConfig(
        num_filaments=2000, nodes_per_filament=50, segment_length=1.0,
        radius=0.25, box_size=120.0, dtype="float32",
        diffusion_coeff=0.05))
    state = sim.init()
    state = sim.run_block(state, 10)
    fence(state.pos)
    print(f"engine={sim.contact_engine} S={sim.S} "
          f"K={state.nmat.idx.shape[1] if hasattr(state.nmat, 'idx') else '-'}")

    ms, _ = timeit(jax.jit(sim._build_nmat), state.pos)
    print(f"rebuild(_build_nmat): {ms:.1f} ms")
    ms, _ = timeit(jax.jit(sim._contact_node_forces), state.pos, state.nmat)
    print(f"contact narrow phase: {ms:.2f} ms")

    from mundy_tpu.mech import rod_internal_forces
    rod_fn = jax.jit(lambda rod, pos, step: rod_internal_forces(
        rod, pos, sim._rest_curvature(step), sim.config.bend_modulus,
        sim.config.stretch_stiffness, sim.config.segment_length))
    ms, _ = timeit(rod_fn, state.rod, state.pos, state.step)
    print(f"rod internal forces:  {ms:.2f} ms")

    step_fn = jax.jit(sim._inner_step)
    ms, _ = timeit(step_fn, state)
    print(f"inner step (no rebuild): {ms:.2f} ms")

    # fused loop: 50 steps, count rebuilds
    rb0 = int(state.rebuild_count)
    t0 = time.perf_counter()
    state = sim.run_block(state, 50)
    fence(state.pos)
    dt = time.perf_counter() - t0
    print(f"run_block(50): {dt / 50 * 1e3:.1f} ms/step = {50 / dt:.1f} steps/s, "
          f"rebuilds={int(state.rebuild_count) - rb0}, "
          f"overflow={bool(state.overflow)}")


if __name__ == "__main__":
    main()
