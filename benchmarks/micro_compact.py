"""Microbench: boolean-mask compaction strategies at 1M on TPU.

active_pair_subset currently scatter-compacts (83 ms measured at C=1.1M);
candidates: jnp.repeat-based, and windows derived from the cumsum instead
of searchsorted (27.8 ms measured).
"""

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


def loop_time(fn, arg, n_loop, tag):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, n_loop, lambda _, c: fn(c), a)

    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run(arg)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n_loop
    print(f"{tag:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


C = 1_100_000
CAP = 655_360
rng = np.random.default_rng(0)
mask = jnp.asarray(rng.random(C) < 0.37)
x = jnp.asarray(rng.random(C), jnp.float32)


def scatter_compact(m):
    cum = jnp.cumsum(m.astype(jnp.int32))
    slots = jnp.where(m, jnp.minimum(cum - 1, CAP), CAP)
    sel = jnp.full((CAP + 1,), C, jnp.int32).at[slots].set(
        jnp.arange(C, dtype=jnp.int32))[:CAP]
    return sel


def repeat_compact(m):
    sel = jnp.repeat(jnp.arange(C, dtype=jnp.int32), m.astype(jnp.int32),
                     total_repeat_length=CAP)
    # repeat pads the tail by repeating the last element; mark pads with C
    cum = jnp.cumsum(m.astype(jnp.int32))
    n_act = cum[-1]
    sel = jnp.where(jnp.arange(CAP) < n_act, sel, C)
    return sel


def repeat_compact_nocheck(m):
    return jnp.repeat(jnp.arange(C, dtype=jnp.int32), m.astype(jnp.int32),
                      total_repeat_length=CAP)


a = loop_time(lambda m: (m, scatter_compact(m).sum() * 0 == 0)[0] if False else m
              , mask, 1, "warm")  # no-op warm

# chain via xor to keep loop-carried dependence
def chain(fn):
    def body(m):
        s = fn(m)
        return m ^ (s[:1] < -1)
    return body


loop_time(chain(scatter_compact), mask, 16, f"scatter compact C={C} cap={CAP}")
loop_time(chain(repeat_compact), mask, 16, "repeat compact (+pad fix)")
loop_time(chain(repeat_compact_nocheck), mask, 16, "repeat compact (raw)")

# windows: searchsorted vs cumsum-gather
ids_sorted = jnp.sort(jnp.asarray(rng.integers(0, 1_000_000, CAP), jnp.int32))
edges = jnp.arange(0, 1_000_000 + 1, 1024, dtype=jnp.int32)


def windows_ss(ids):
    return jnp.searchsorted(ids, edges).astype(jnp.int32)


loop_time(lambda ids: ids ^ (windows_ss(ids)[:1] < -1), ids_sorted, 16,
          "segment windows searchsorted (977 edges)")

# cumsum-derived: given full-list seg starts + compaction cumsum
full_starts = jnp.asarray(np.sort(rng.integers(0, C, 978)), jnp.int32)


def windows_cum(m):
    cum = jnp.cumsum(m.astype(jnp.int32))
    return jnp.where(full_starts > 0, cum[jnp.maximum(full_starts - 1, 0)], 0)


loop_time(chain(lambda m: windows_cum(m)), mask, 16,
          "windows from compaction cumsum")

# plain cumsum cost for reference
loop_time(lambda m: m ^ (jnp.cumsum(m.astype(jnp.int32))[:1] < -1), mask, 16,
          "bare cumsum 1.1M")

# vector gather reference: (CAP,3) from (1M,3)
pos = jnp.asarray(rng.random((1_000_000, 3)), jnp.float32)
idx = jnp.asarray(rng.integers(0, 1_000_000, CAP), jnp.int32)
loop_time(lambda i: i ^ (pos[i].sum() < -1), idx, 16,
          "one (655k,3) vector gather")
