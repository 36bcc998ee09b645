"""Microbenchmarks: ns/op for the kernel library.

The nanobench analog of the reference's performance tests
(`PerfTestFieldBLAS.cpp`, `PerfTestGeomMetric.cpp:54,91`,
`MatrixVectorQuaternion.cpp` — SURVEY.md §4): per-op timings for field
BLAS, distance kernels, quaternion algebra, and the BBPGD solver.

Usage: python benchmarks/micro.py [--n 1000000]   (one JSON line per op)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fence(out):
    """Force completion: on the tunneled axon runtime block_until_ready
    returns early — only a device->host scalar readback is a real fence."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def bench(name, fn, *args, n_ops, repeats=20):
    f = jax.jit(fn)
    out = f(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = f(*args)
        _fence(out)  # per call: numbers include ~1 host-device round trip
    per_call = (time.perf_counter() - t0) / repeats
    print(json.dumps({
        "op": name, "sec_per_call": per_call,
        "ns_per_op": per_call / n_ops * 1e9, "n_ops": n_ops,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.n
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 3), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (n, 3), jnp.float32)

    # field BLAS (ref PerfTestFieldBLAS)
    from mundy_tpu.state import field_axpby, field_dot, field_nrm2

    bench("field_axpby", lambda a, b: field_axpby(2.0, a, 0.5, b), x, y, n_ops=n)
    bench("field_dot", field_dot, x, y, n_ops=n)
    bench("field_nrm2", field_nrm2, x, n_ops=n)

    # geom distance metrics (ref PerfTestGeomMetric)
    from mundy_tpu.geom import Sphere, distance_sphere_sphere, periodic
    from mundy_tpu.geom.distance import segment_segment_closest

    r = jnp.full((n,), 0.5, jnp.float32)
    metric = periodic([10.0, 10.0, 10.0], dtype=jnp.float32)
    bench("distance_sphere_sphere",
          lambda a, b: distance_sphere_sphere(Sphere(a, r), Sphere(b, r)).dist,
          x, y, n_ops=n)
    bench("distance_sphere_sphere_periodic",
          lambda a, b: distance_sphere_sphere(Sphere(a, r), Sphere(b, r),
                                              metric=metric).dist,
          x, y, n_ops=n)
    a1 = x + 1.0
    b1 = y + 1.0
    bench("segment_segment_closest",
          lambda p, q, u, v: segment_segment_closest(p, q, u, v)[2],
          x, a1, y, b1, n_ops=n)

    # quaternions (ref MatrixVectorQuaternion)
    from mundy_tpu.math import quat_multiply, quat_rotate, quat_normalize

    q = quat_normalize(jax.random.normal(jax.random.fold_in(key, 2), (n, 4), jnp.float32))
    bench("quat_multiply", quat_multiply, q, q, n_ops=n)
    bench("quat_rotate", quat_rotate, q, x, n_ops=n)

    # BBPGD LCP (batched per-pair instantiation)
    from mundy_tpu.math import solve_lcp, PGDConfig

    m = 4096
    A = jnp.eye(8)[None] * 4.0 + 0.1
    As = jnp.broadcast_to(A, (m, 8, 8))
    qs = jax.random.normal(jax.random.fold_in(key, 3), (m, 8), jnp.float32)
    cfg = PGDConfig(max_iters=100, tol=1e-5)
    bench("bbpgd_lcp_8x8_batched",
          lambda A_, q_: jax.vmap(lambda a, b: solve_lcp(lambda v: a @ v, b,
                                                         config=cfg).x)(A_, q_),
          As, qs, n_ops=m)


if __name__ == "__main__":
    main()
