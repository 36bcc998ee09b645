"""Row-engine rods (driver/apps/rods_rows.py) vs the (N, K) engine:
identical physics, gather-free hot path."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.rods import RodsConfig, RodsSim
from mundy_tpu.driver.apps.rods_rows import RowRodsSim


def make_cfg(**kw):
    base = dict(num_rods=400, box_size=24.0, radius=0.25, length=2.0,
                dt=1e-4, num_steps=30, dtype="float64", chunk=512,
                log_every=1000)
    base.update(kw)
    return RodsConfig(**base)


def test_row_rods_matches_nmat_engine():
    """Same initial condition, zero noise: both engines must produce the
    same trajectory (same contact set, same arithmetic per pair)."""
    cfg = make_cfg()
    nmat_sim = RodsSim(make_cfg())
    row_sim = RowRodsSim(make_cfg())
    s_n = nmat_sim.init()
    pos0, quat0 = np.asarray(s_n.pos), np.asarray(s_n.quat)
    s_r = row_sim.init(pos=pos0, quat=quat0)
    assert not bool(s_r.overflow)

    steps = 30
    s_n = nmat_sim.run_block(s_n, steps)
    s_r = row_sim.run_block(s_r, steps)
    jax.block_until_ready(s_r.rows.pos)
    assert not bool(s_n.overflow) and not bool(s_r.overflow)

    pn = np.asarray(s_n.pos)
    pr = np.asarray(row_sim.positions(s_r))
    diff = pn - pr
    diff -= cfg.box_size * np.round(diff / cfg.box_size)
    assert np.abs(diff).max() < 1e-9, np.abs(diff).max()
    qn = np.asarray(s_n.quat)
    qr = np.asarray(row_sim.quaternions(s_r))
    # q and -q are the same rotation
    qdiff = np.minimum(np.abs(qn - qr).max(axis=1),
                       np.abs(qn + qr).max(axis=1))
    assert qdiff.max() < 1e-9, qdiff.max()


def test_row_rods_brownian_runs_and_conserves():
    cfg = make_cfg(diffusion_coeff=0.05, rot_diffusion_coeff=0.05,
                   num_steps=100)
    sim = RowRodsSim(cfg)
    state = sim.init()
    state = sim.run_block(state, 100)
    jax.block_until_ready(state.rows.pos)
    assert not bool(state.overflow)
    assert int(jnp.sum(state.rows.valid)) == cfg.num_rods
    pos = np.asarray(sim.positions(state))
    assert np.isfinite(pos).all()
    q = np.asarray(sim.quaternions(state))
    # quaternions stay unit under the integrator
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-8)
