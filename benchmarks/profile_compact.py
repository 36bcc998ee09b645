"""Micro-profile of the LCP per-step active-set compaction at 1M scale.

Synthetic full pair list with realistic shapes/occupancy (C=900k, 40%
active, i-sorted block structure) — times variants of
active_pair_subset_strided on-device to find where the 134 ms goes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mundy_tpu.constraints.collision import (CollisionSetup,
                                             active_pair_subset_strided)
from mundy_tpu.neighbor.cell_list import PairList


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def loop_time(fn, arg, n_loop, tag):
    @jax.jit
    def run(a):
        def body(_, carry):
            out = fn(carry)
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype")]
            acc = sum(jnp.ravel(x)[0].astype(jnp.float32) for x in leaves[:2])
            return carry + 1e-9 * acc
        return jax.lax.fori_loop(0, n_loop, body, a)

    out = run(arg)
    fence(out)
    t0 = time.perf_counter()
    out = run(arg)
    fence(out)
    dt = (time.perf_counter() - t0) / n_loop
    print(f"{tag:50s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main(n=1_000_000, C=900_096, B=1024, W=768):
    rng = np.random.default_rng(0)
    nb = -(-n // B)
    # realistic i-sorted pair list: ~C/n pairs per body
    i = np.sort(rng.integers(0, n, C)).astype(np.int32)
    j = rng.integers(0, n, C).astype(np.int32)
    mask = np.ones(C, bool)
    sep0 = rng.uniform(-0.1, 0.25, C).astype(np.float32)  # ~44% < 0.1
    normals = rng.normal(size=(C, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    starts = np.searchsorted(i, np.arange(0, nb * B, B)).astype(np.int32)
    pairs = PairList(i=jnp.asarray(i), j=jnp.asarray(j),
                     mask=jnp.asarray(mask), num_pairs=jnp.asarray(C),
                     overflow=jnp.asarray(False))
    setup = CollisionSetup(pairs=pairs, normals=jnp.asarray(normals),
                           sep0=jnp.asarray(sep0))
    full_starts = jnp.asarray(starts)
    dual_full = jnp.asarray(rng.integers(0, C, C).astype(np.int32))
    prev_cum = jnp.cumsum(
        jnp.asarray(rng.random(C) < 0.44, jnp.int32))
    prev_gamma = jnp.asarray(rng.random(nb * W).astype(np.float32))
    gamma_full = jnp.asarray(rng.random(C).astype(np.float32))
    margin = jnp.asarray(0.1, jnp.float32)

    x = jnp.asarray(0.0, jnp.float32)

    def with_offset(fn):
        # fold the loop counter into sep0 so XLA can't hoist the call
        def g(t):
            s = setup._replace(sep0=setup.sep0 + 0.0 * t)
            return fn(s)
        return g

    loop_time(with_offset(lambda s: active_pair_subset_strided(
        s, margin, n, B, W, full_starts, dual_full=dual_full,
        prev=(prev_cum, prev_gamma, W), gamma_full=gamma_full)), x, 16,
        "full (dual + prev + gamma_full)")
    loop_time(with_offset(lambda s: active_pair_subset_strided(
        s, margin, n, B, W, full_starts, dual_full=dual_full)), x, 16,
        "dual only (no warm start)")
    loop_time(with_offset(lambda s: active_pair_subset_strided(
        s, margin, n, B, W, full_starts,
        prev=(prev_cum, prev_gamma, W), gamma_full=gamma_full)), x, 16,
        "warm only (no dual)")
    loop_time(with_offset(lambda s: active_pair_subset_strided(
        s, margin, n, B, W, full_starts)), x, 16, "bare")

    # pieces
    def bare_nogathers(s):
        act = s.pairs.mask & (s.sep0 < margin)
        cum = jnp.cumsum(act.astype(jnp.int32))
        base = jnp.where(full_starts > 0,
                         cum[jnp.maximum(full_starts - 1, 0)], 0)
        bid = jnp.minimum(s.pairs.i // B, nb - 1)
        rank = cum - 1 - base[bid]
        ok = act & (rank < W)
        slot = jnp.where(ok, bid * W + rank, nb * W)
        sel = jnp.full((nb * W + 1,), C, jnp.int32).at[slot].set(
            jnp.arange(C, dtype=jnp.int32), mode="drop")[:nb * W]
        return sel
    loop_time(with_offset(bare_nogathers), x, 16,
              "  cumsum+rank+scatter (sel only)")

    sel = bare_nogathers(setup)
    sel_c = jnp.minimum(sel, C - 1)

    def gathers_only(s):
        valid = sel < C
        ai = jnp.where(valid, s.pairs.i[sel_c], n)
        aj = jnp.where(valid, s.pairs.j[sel_c], n)
        an = jnp.where(valid[:, None], s.normals[sel_c], 0.0)
        as0 = jnp.where(valid, s.sep0[sel_c], 1.0)
        return ai + aj + as0.astype(jnp.int32) + an[:, 0].astype(jnp.int32)
    loop_time(with_offset(gathers_only), x, 16,
              "  A-side gathers (i,j,normals,sep0)")

    # sep0-over-C cost (setup_full equivalent): 2 vector gathers + norm
    pos = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))

    def sep_over_C(t):
        pi = pos[pairs.i] + t
        pj = pos[pairs.j]
        d = pj - pi
        return jnp.sum(d * d, axis=-1)
    loop_time(sep_over_C, x, 16, "  sep0 over C (2 vector gathers)")


if __name__ == "__main__":
    main()
