"""Pallas half-stencil central-force kernel vs the XLA row path.

Runs in interpreter mode on CPU (compiled mode is exercised on real TPU by
the bench); checks the Newton's-third-law partner accumulation, the periodic
image pre-shifts, and the sentinel no-mask contract against
pair_accumulate_central (itself validated against the flat engine).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.forces.contact import effective_youngs, hertzian_pair_force
from mundy_tpu.neighbor.rows import (
    build_rows,
    make_row_grid,
    pair_accumulate_central,
    pair_accumulate_central_sym,
)
from mundy_tpu.ops.pallas.row_central import row_hertzian_forces_sym


def _setup(n=4000, box=12.0, seed=3):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    grid = make_row_grid([0, 0, 0], [box] * 3, 1.4, n, dtype=jnp.float32,
                         align=8)
    assert grid.nz % 8 == 0
    state = build_rows(pos, jnp.arange(n, dtype=jnp.int32), grid)
    return state, box


def _scalar_fn(radius=0.5, youngs=1000.0, poisson=0.3):
    e_eff = effective_youngs(youngs, youngs, poisson, poisson)
    two_r = jnp.float32(2 * radius)
    r_eff = jnp.float32(0.5 * radius)

    def fn(r2):
        r2 = jnp.maximum(r2, 1e-24)
        rinv = jax.lax.rsqrt(r2)
        d = r2 * rinv
        mag = hertzian_pair_force(d - two_r, r_eff, jnp.float32(e_eff))
        return -mag * rinv

    return fn


def test_sym_xla_matches_full_stencil():
    state, box = _setup()
    boxs = ((box,) * 3, (True,) * 3)
    f9 = pair_accumulate_central(state, boxs, _scalar_fn())
    f5 = pair_accumulate_central_sym(state, boxs, _scalar_fn())
    np.testing.assert_allclose(np.asarray(f5), np.asarray(f9),
                               atol=2e-3 * float(jnp.abs(f9).max()))


def test_pallas_sym_matches_xla():
    state, box = _setup()
    boxs = ((box,) * 3, (True,) * 3)
    f_ref = pair_accumulate_central(state, boxs, _scalar_fn())
    f_pal = row_hertzian_forces_sym(state.pos, (box,) * 3, 0.5, 1000.0, 0.3,
                                    interpret=True)
    m = np.asarray(state.valid)
    a = np.asarray(f_ref)[m]
    b = np.asarray(f_pal)[m]
    assert np.abs(a - b).max() <= 2e-5 * max(np.abs(a).max(), 1.0)


def test_pallas_sym_rejects_unaligned_nz():
    state, box = _setup()
    grid = make_row_grid([0, 0, 0], [box] * 3, 1.4, 100, dtype=jnp.float32)
    if grid.nz % 8 == 0:
        pytest.skip("grid happens to be aligned")
    pos = jnp.zeros((grid.ny, grid.nz, grid.row_capacity, 3), jnp.float32)
    with pytest.raises(ValueError):
        row_hertzian_forces_sym(pos, (box,) * 3, 0.5, 1000.0, 0.3,
                                interpret=True)
