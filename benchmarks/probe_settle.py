"""Which capacity trips during the 1M LCP cold settle?

The published north-star line carries a `settle_overflow` caveat: some
capacity overflows while the cold random start relaxes, before the
between-block refits land. This probe runs the settle in short blocks and
prints the overflow SOURCE breakdown the moment the sticky flag raises —
the input for pre-sizing init so the settle runs clean.

Run: python benchmarks/probe_settle.py [n] [buffer]
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


def sources(sim, state):
    from mundy_tpu.constraints.collision import (body_pair_starts,
                                                 pair_dual_slots)
    from mundy_tpu.ops.segments import segment_windows

    c = sim.config
    pos = state.pos
    nmat, pairs, hmat, seg_starts, dual_full, _ = sim._broad_phase(pos)
    starts = body_pair_starts(nmat)
    seg = segment_windows(pairs.i, c.num_spheres, sim.seg_block,
                          sim.seg_window, body_starts=starts)
    _dual, dual_missing = pair_dual_slots(pairs, starts, nmat)
    import numpy as np
    counts = np.diff(np.append(
        np.asarray(jax.device_get(seg.starts)),
        int(jax.device_get(pairs.num_pairs))))
    return {
        "nmat(rows)": bool(nmat.overflow),
        "pairs": bool(pairs.overflow),
        "seg_windows": bool(seg.overflow),
        "dual_missing": bool(dual_missing),
        "pairs_count_vs_cap": [int(pairs.num_pairs), sim.pair_capacity],
        "seg_blockmax_vs_W": [int(counts.max()), sim.seg_window],
        "act_block_max_vs_W": [int(state.act_block_max), sim.act_window],
    }


def main(n=1_000_000, buffer=0.45):
    box = (n * (4 / 3) * math.pi * 0.125 / 0.05) ** (1 / 3)
    c = LCPSpheresConfig(num_spheres=n, box_size=float(box), radius=0.5,
                         dt=1e-3, diffusion_coeff=0.1,
                         constraint_buffer=buffer)
    sim = LCPSpheresSim(c)
    state = sim.init()
    print(f"init: pair_cap={sim.pair_capacity} rows_k={sim.rows_k} "
          f"rows_slack={sim.rows_slack} W={sim.act_window} "
          f"seg_W={sim.seg_window} ovf={bool(state.overflow)}", flush=True)
    for blk in range(9):
        t0 = time.perf_counter()
        state = sim.run_block(state, 3, resize=False)
        fence(state.pos)
        ovf = bool(state.overflow)
        print(f"block {blk}: steps={int(state.step)} ovf={ovf} "
              f"act={int(state.act_count)} blkmax={int(state.act_block_max)} "
              f"iters_max={int(state.lcp_iters_max)} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        if ovf:
            print("sources:", sources(sim, state), flush=True)
            break


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45
    main(n, b)
