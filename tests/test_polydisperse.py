"""Polydisperse radii on the fast paths (round-1 VERDICT missing #5):
rows broad phase, row force engine, LCP pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.lcp_spheres import LCPSpheresConfig, LCPSpheresSim
from mundy_tpu.driver.apps.spheres import SpheresConfig, SpheresSim
from mundy_tpu.driver.apps.spheres_rows import RowSpheresSim
from mundy_tpu.neighbor.rows import neighbor_matrix_rows


def test_rows_broad_phase_polydisperse_brute_force_parity(rng):
    n, box = 600, 16.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    sr = jnp.asarray(rng.uniform(0.3, 0.9, n))
    nmat = neighbor_matrix_rows(pos, 0.9, (box,) * 3, max_neighbors=32,
                                search_radii=sr)
    assert not bool(nmat.overflow)
    p = np.asarray(pos)
    s = np.asarray(sr)
    d = p[:, None, :] - p[None, :, :]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    cut = s[:, None] + s[None, :]
    idx = np.asarray(nmat.idx)
    mask = np.asarray(nmat.mask)
    for i in range(n):
        want = set(np.nonzero((dist[i] < cut[i]) & (np.arange(n) != i))[0])
        got = set(idx[i][mask[i]].tolist())
        assert want == got, (i, sorted(want ^ got))


def test_row_engine_matches_nmat_engine_polydisperse():
    """Same radii draw (seed + 777): the row fast path must track the
    (N, K) engine's polydisperse trajectory."""
    kw = dict(num_spheres=500, box_size=14.0, radius=0.5,
              polydispersity=0.4, diffusion_coeff=0.05, dt=1e-4,
              num_steps=60, dtype="float64", chunk=512, log_every=1000)
    sim_flat = SpheresSim(SpheresConfig(**kw))
    sim_rows = RowSpheresSim(SpheresConfig(**kw))
    s_f = sim_flat.init()
    s_r = sim_rows.init()
    s_f = sim_flat.run_block(s_f, 60)
    s_r = sim_rows.run_block(s_r, 60)
    jax.block_until_ready(s_r.rows.pos)
    assert not bool(s_f.overflow) and not bool(s_r.overflow)
    pf = np.asarray(s_f.pos)
    pr = np.asarray(sim_rows.positions(s_r))
    diff = pf - pr
    diff -= 14.0 * np.round(diff / 14.0)
    assert np.abs(diff).max() < 1e-9, np.abs(diff).max()


def test_lcp_polydisperse_resolves_overlap():
    n = 400
    cfg = LCPSpheresConfig(num_spheres=n, box_size=18.0, radius=0.5,
                           polydispersity=0.5, dt=1e-3, num_steps=30,
                           dtype="float64", log_every=1000)
    sim = LCPSpheresSim(cfg)
    state = sim.init()
    over0 = sim.max_overlap(state)
    assert over0 > 0.1  # random init overlaps
    state = sim.run_block(state, 30)
    jax.block_until_ready(state.pos)
    assert not bool(state.overflow)
    assert sim.max_overlap(state) < 1e-4, sim.max_overlap(state)
