"""Pallas fused row-force kernel vs the XLA pair_accumulate path.

Runs in interpreter mode on CPU (compiled mode is exercised on real TPU by
the bench; interpret mode checks kernel semantics including the periodic
wraps and self-exclusion).
"""

import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.spheres import SpheresConfig
from mundy_tpu.driver.apps.spheres_rows import RowSpheresSim
from mundy_tpu.ops.pallas.row_hertz import row_hertzian_forces


def test_pallas_matches_xla_row_forces():
    cfg = SpheresConfig(num_spheres=1500, box_size=24.0, radius=0.5,
                        diffusion_coeff=0.0, dt=1e-4, skin=0.4,
                        dtype="float32")
    sim = RowSpheresSim(cfg)
    rows = sim.init().rows
    f_ref = np.asarray(sim._forces(rows))
    f_pal = np.asarray(row_hertzian_forces(
        rows.pos, rows.valid, [24.0] * 3, 0.5, cfg.youngs_modulus,
        cfg.poissons_ratio, interpret=True))
    scale = max(np.abs(f_ref).max(), 1e-9)
    np.testing.assert_allclose(f_pal, f_ref, atol=5e-5 * scale)
    # momentum-free (wrap-consistent pair antisymmetry)
    total = f_pal.reshape(-1, 3)[np.asarray(rows.valid).reshape(-1)].sum(axis=0)
    assert np.abs(total).max() < 1e-2 * scale


def test_pallas_periodic_wrap_pairs():
    """A pair straddling the periodic boundary must interact."""
    cfg = SpheresConfig(num_spheres=2, box_size=12.0, radius=0.5,
                        diffusion_coeff=0.0, dtype="float32")
    sim = RowSpheresSim(cfg)
    state = sim.init()
    import jax

    pos = jnp.asarray([[0.2, 6.0, 6.0], [11.9, 6.0, 6.0]], jnp.float32)
    from mundy_tpu.neighbor.rows import build_rows

    rows = build_rows(pos, jnp.arange(2, dtype=jnp.int32), sim.grid)
    f = np.asarray(row_hertzian_forces(rows.pos, rows.valid, [12.0] * 3, 0.5,
                                       cfg.youngs_modulus, cfg.poissons_ratio,
                                       interpret=True))
    fv = f.reshape(-1, 3)[np.asarray(rows.valid).reshape(-1)]
    # wrapped distance 0.3 < 2r = 1: strong repulsion across the boundary
    assert np.abs(fv).max() > 1.0
    np.testing.assert_allclose(fv.sum(axis=0), 0.0, atol=1e-3)
