"""Pallas half-stencil segment-segment kernel vs the XLA row path.

Runs in interpreter mode on CPU (compiled mode is exercised on real TPU by
the bench); checks the multi-output Newton's-third-law partner accumulation
(force AND torque about each body's own center), the periodic image
pre-shifts, scalar payload channels, and the coincident-pair noise floor
against pair_accumulate_segments (itself validated against the flat
segment_segment_closest kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.forces.contact import effective_youngs, hertzian_pair_force
from mundy_tpu.geom.randomize import random_unit_quaternions
from mundy_tpu.math.quaternion import quat_rotate
from mundy_tpu.neighbor.rows import (
    build_rows,
    make_row_grid,
    pair_accumulate_segments,
)
from mundy_tpu.ops.pallas.row_segments import row_segment_pairs_sym

# python-float closure constants: Pallas kernels reject captured traced
# scalars (jnp.float32 values) — they must be inlined literals
RADIUS = 0.2
LENGTH = 0.8
TWO_R = float(2 * RADIUS)
R_EFF = float(0.5 * RADIUS)
E_EFF = float(effective_youngs(200.0, 200.0, 0.3, 0.3))


def _setup(n=600, box=12.8, seed=7):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    cutoff = 1.6  # >= LENGTH + 2 * RADIUS; 12.8 / 1.6 = 8 cells per axis
    grid = make_row_grid([0, 0, 0], [box] * 3, cutoff, n, dtype=jnp.float32,
                         align=8)
    assert grid.nz % 8 == 0 and grid.ny >= 5
    state = build_rows(pos, jnp.arange(n, dtype=jnp.int32), grid)
    quat = random_unit_quaternions(jax.random.PRNGKey(seed), n,
                                   dtype=jnp.float32)
    zhat = jnp.zeros((3,), jnp.float32).at[2].set(1.0)
    axes_flat = quat_rotate(quat, zhat)
    safe = jnp.minimum(state.gid, n - 1)
    axes = jnp.where(state.valid[..., None], axes_flat[safe], 0.0)
    hedges = jnp.float32(0.5 * LENGTH) * axes
    return state, hedges, box


def _rod_fns():
    """The rods force+torque pair: own outputs and partner outputs."""
    radius = RADIUS

    def common(d2, dx, dy, dz):
        d2c = jnp.maximum(d2, 1e-24)
        rinv = jax.lax.rsqrt(d2c)
        dist = d2c * rinv
        mag = hertzian_pair_force(dist - TWO_R, R_EFF, E_EFF)
        w = -(mag * rinv)
        return w * dx, w * dy, w * dz, rinv

    def out_fn(s, t, dx, dy, dz, d2, oex, _cex, oey, _cey, oez, _cez):
        fx, fy, fz, rinv = common(d2, dx, dy, dz)
        u2 = 2.0 * s - 1.0
        rr = radius * rinv
        px = u2 * oex + rr * dx
        py = u2 * oey + rr * dy
        pz = u2 * oez + rr * dz
        return (fx, fy, fz,
                py * fz - pz * fy, pz * fx - px * fz, px * fy - py * fx)

    def partner_fn(s, t, dx, dy, dz, d2, _oex, cex, _oey, cey, _oez, cez):
        fx, fy, fz, rinv = common(d2, dx, dy, dz)
        gx, gy, gz = -fx, -fy, -fz
        v2 = 2.0 * t - 1.0
        rr = radius * rinv
        px = v2 * cex - rr * dx
        py = v2 * cey - rr * dy
        pz = v2 * cez - rr * dz
        return (gx, gy, gz,
                py * gz - pz * gy, pz * gx - px * gz, px * gy - py * gx)

    return out_fn, partner_fn


def test_pallas_segments_matches_xla():
    state, hedges, box = _setup()
    boxs = ((box,) * 3, (True,) * 3)
    out_fn, partner_fn = _rod_fns()
    ref = pair_accumulate_segments(
        state, boxs, hedges, out_fn,
        extra_fields=(hedges[..., 0], hedges[..., 1], hedges[..., 2]))
    got = row_segment_pairs_sym(state.pos, hedges, (box,) * 3,
                                out_fn, partner_fn, 6, interpret=True)
    scale = max(float(jnp.abs(ref[0]).max()), 1e-6)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-4 * scale)
    # something actually touched
    assert float(jnp.abs(ref[0]).max()) > 0


def test_pallas_segments_scalar_payload():
    """Filaments-style usage: a gid payload excluding adjacent pairs, with
    arc-weighted node-split outputs (asymmetric per-side weighting)."""
    state, hedges, box = _setup(n=400, seed=11)

    def mk(own_first):
        def fn(s, t, dx, dy, dz, d2, own_g, cand_g,
               _oex, _cex, _oey, _cey, _oez, _cez):
            d2c = jnp.maximum(d2, 1e-24)
            rinv = jax.lax.rsqrt(d2c)
            dist = d2c * rinv
            mag = hertzian_pair_force(dist - TWO_R, R_EFF, E_EFF)
            adjacent = jnp.abs(jnp.abs(cand_g - own_g) - 1.0) < 0.5
            w = jnp.where(adjacent, 0.0, -(mag * rinv))
            sgn = 1.0 if own_first else -1.0
            arc = s if own_first else t
            fx, fy, fz = sgn * w * dx, sgn * w * dy, sgn * w * dz
            return ((1.0 - arc) * fx, (1.0 - arc) * fy, (1.0 - arc) * fz,
                    arc * fx, arc * fy, arc * fz)
        return fn

    out_fn, partner_fn = mk(True), mk(False)
    gid_f = jnp.where(state.valid, state.gid.astype(jnp.float32), -10.0)
    boxs = ((box,) * 3, (True,) * 3)
    ref = pair_accumulate_segments(
        state, boxs, hedges, out_fn,
        extra_fields=(gid_f, hedges[..., 0], hedges[..., 1], hedges[..., 2]))
    got = row_segment_pairs_sym(state.pos, hedges, (box,) * 3,
                                out_fn, partner_fn, 6,
                                own_scalars=(gid_f,), interpret=True)
    scale = max(float(jnp.abs(ref[0]).max()), 1e-6)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-4 * scale)
