"""Minimal repro for the round-2 'Pallas gridding kernels fault inside the
fused nested-while run program on v5e' issue.

Shape: the apps' fused run loop is an outer while (rebuild cadence) whose
body runs an inner while of physics steps — this script puts the Pallas SE
row gridding kernels (se_spread_rows_pre / se_interp_rows_pre, the kernels
that faulted) inside exactly that nested-while structure and steps a tiny
spectral-Ewald wave apply.

Outcome is recorded in PERF.md. The PRODUCTION paths no longer depend on
this: the dense-MXU (se_*_dense) and 3D-tile (se_*_tiles) gridding used by
the lcp/chromatin apps are pure XLA inside the fused loops (see the note at
driver/apps/lcp_spheres.py run_block).

Run: python benchmarks/repro_pallas_nested_while.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    from mundy_tpu.mobility.spectral import (build_spectral_ewald,
                                             make_se_geometry, _k_apply)
    from mundy_tpu.ops.pallas.se_grid import (
        se_bin_and_windows, se_interp_rows_pre, se_spread_rows_pre)

    n = 2048
    box = 12.0
    op = build_spectral_ewald(box, 0.5, 1.0, tol=1e-4, n_particles=n,
                              dtype=jnp.float32)
    geom = make_se_geometry(op, n)
    interpret = jax.default_backend() == "cpu"
    key = jax.random.PRNGKey(0)
    pos0 = jax.random.uniform(key, (n, 3), jnp.float32, 0.0, box)
    f0 = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)

    def wave_u(pos, f):
        pieces = se_bin_and_windows(geom, pos, jnp.float32)
        grid = se_spread_rows_pre(geom, pieces, f, interpret)
        ugrid = _k_apply(op, grid)
        return se_interp_rows_pre(geom, pieces, n, ugrid.astype(jnp.float32),
                                  interpret)

    @jax.jit
    def run(pos, f, n_steps):
        # the apps' fused structure: outer while (rebuild cadence), inner
        # while (step bursts), Pallas kernels in the inner body
        def inner_body(carry):
            p, ff, done = carry
            u = wave_u(p, ff)
            return p + 1e-4 * u, ff, done + 1

        def inner_cond(carry):
            return jnp.logical_and(carry[2] < n_steps,
                                   carry[2] % 4 != 0)

        def outer_body(carry):
            carry = inner_body(carry)  # "rebuild step"
            return jax.lax.while_loop(inner_cond, inner_body, carry)

        p, ff, done = jax.lax.while_loop(
            lambda c: c[2] < n_steps, outer_body,
            (pos, f, jnp.asarray(0, jnp.int32)))
        return p, done

    p, done = run(pos0, f0, jnp.asarray(12, jnp.int32))
    # scalar readback fence (block_until_ready is not a fence on axon)
    s = float(jnp.sum(p[0]))
    assert jnp.isfinite(jnp.asarray(s)), s
    print(f"PASS backend={jax.default_backend()} jax={jax.__version__} "
          f"steps={int(done)} checksum={s:.6f}")


if __name__ == "__main__":
    main()
