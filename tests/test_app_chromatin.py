"""Chromatin/HP1 app: chains + contact + KMC + confinement."""

import jax.numpy as jnp
import numpy as np

from mundy_tpu.driver.apps.chromatin import ChromatinConfig, ChromatinSim
from mundy_tpu.kmc import BINDING_STATE
import pytest

pytestmark = pytest.mark.slow


def cfg(**kw):
    base = dict(num_chains=2, beads_per_chain=64, bead_radius=0.5,
                num_crosslinkers=32, diffusion_coeff=0.05, dt=2e-4,
                num_steps=50, dtype="float64", chunk=256, log_every=1000)
    base.update(kw)
    return ChromatinConfig(**base)


def test_chains_stay_connected():
    from mundy_tpu.driver.regrow import run_blocks

    sim = ChromatinSim(cfg(num_steps=200))
    state = sim.init()
    # the public driver loop: free chains COMPACT over time, so the
    # init-measured candidate capacities can overflow mid-run — the regrow
    # loop (aux failure recovery) re-widens and retries, and the final
    # state must be clean
    state = run_blocks(sim, state, 200, 50, log=lambda s: None)
    assert not bool(state.overflow)
    pos = np.asarray(state.pos).reshape(2, 64, 3)
    bond_len = np.linalg.norm(np.diff(pos, axis=1), axis=-1)
    # FENE rmax = 1.5 * 2r = 1.5: no bond may exceed it
    assert bond_len.max() < 1.5
    assert bond_len.min() > 0.3  # WCA keeps beads from collapsing
    assert np.isfinite(pos).all()


def test_crosslinkers_bind_and_unbind():
    sim = ChromatinSim(cfg(binding_rate=50.0, unbinding_rate=5.0))
    state = sim.init()
    assert int(jnp.sum(state.xl_state == BINDING_STATE.DOUBLY_BOUND)) == 0
    state = sim.run_block(state, 300)
    bound = int(jnp.sum(state.xl_state == BINDING_STATE.DOUBLY_BOUND))
    assert bound > 0  # some bound
    # bound targets are valid beads
    bt = np.asarray(state.xl_bound_to)
    st = np.asarray(state.xl_state)
    assert (bt[st == BINDING_STATE.DOUBLY_BOUND] >= 0).all()
    assert (bt[st == BINDING_STATE.LEFT_BOUND] == -1).all()


def test_periphery_confines():
    R = 12.0
    sim = ChromatinSim(cfg(periphery_radius=R, diffusion_coeff=0.2))
    state = sim.init()
    state = sim.run_block(state, 300)
    r = np.linalg.norm(np.asarray(state.pos), axis=1)
    assert r.max() < R + 0.5  # at most marginal poke-out against the wall


def test_kmc_candidates_reach_rest_length():
    """Regression (round-1 VERDICT): crosslinker candidates were drawn from
    the CONTACT neighbor matrix, whose pair cutoff (2r + skin = 1.4 at
    defaults) sits below crosslinker_rest_length = 1.5 — the Gaussian
    binding rate's peak was invisible to KMC. The dedicated KMC search must
    see a partner placed exactly at the rest length."""
    c = cfg(num_crosslinkers=4)
    sim = ChromatinSim(c)
    # the regression precondition: contact cutoff < rest length
    assert 2 * sim.search_radius < c.crosslinker_rest_length
    state = sim.init()
    pos = np.asarray(state.pos).copy()
    home = int(np.asarray(state.xl_home)[0])
    partner = (home + c.beads_per_chain) % sim.N  # bead of the other chain
    # park the partner exactly at the binding rest length, away from others
    pos[home] = np.array([40.0, 0.0, 0.0])
    pos[partner] = pos[home] + np.array([c.crosslinker_rest_length, 0, 0])
    nmat, _h, kmat, _ovf = sim._build_nmat(jnp.asarray(pos), state.xl_home)
    in_contact = bool(jnp.any((nmat.idx[home] == partner) & nmat.mask[home]))
    # kmat rows are per-crosslinker: row 0 belongs to crosslinker 0
    in_kmc = bool(jnp.any((kmat.idx[0] == partner) & kmat.mask[0]))
    assert not in_contact  # the old candidate source misses it...
    assert in_kmc  # ...the dedicated search finds it


def test_kmc_candidate_set_brute_force_parity():
    """Every bead within the capture radius of a home bead must appear in
    its KMC candidate row (barring K overflow, which must then be flagged)."""
    c = cfg(num_crosslinkers=8)
    sim = ChromatinSim(c)
    state = sim.init()
    pos = np.asarray(state.pos)
    _n, _h, kmat, ovf = sim._build_nmat(state.pos, state.xl_home)
    idx = np.asarray(kmat.idx)
    mask = np.asarray(kmat.mask)
    for x in range(sim.X):
        home = int(np.asarray(state.xl_home)[x])
        d = np.linalg.norm(pos - pos[home], axis=1)
        want = set(np.nonzero((d <= sim.kmc_capture) & (d > 0))[0].tolist())
        got = set(idx[x][mask[x]].tolist())
        missing = want - got
        assert not missing or bool(ovf), (home, sorted(missing))


def test_kmc_binds_beyond_contact_cutoff():
    """End-to-end: with positions effectively frozen (dt ~ 0), KMC must form
    doubly-bound crosslinkers at separations past the old contact cutoff."""
    c = cfg(num_crosslinkers=24, binding_rate=2e4, unbinding_rate=0.0,
            diffusion_coeff=0.0, dt=1e-7)
    sim = ChromatinSim(c)
    state = sim.init()
    state = sim.run_block(state, 100)
    st = np.asarray(state.xl_state)
    bt = np.asarray(state.xl_bound_to)
    pos = np.asarray(state.pos)
    hp = pos[np.asarray(state.xl_home)]
    doubly = st == BINDING_STATE.DOUBLY_BOUND
    assert doubly.any()
    d = np.linalg.norm(pos[np.maximum(bt, 0)] - hp, axis=1)[doubly]
    # Hilbert-curve chains offer abundant partners at sqrt(2) and 2.0 bead
    # diameters — past the 1.4 contact cutoff that used to truncate KMC
    assert d.max() > 2 * sim.search_radius


def test_rpy_hydro_runs():
    sim = ChromatinSim(cfg(hydro="rpy_neighbors", num_steps=20))
    state = sim.run_block(sim.init(), 20)
    assert np.isfinite(np.asarray(state.pos)).all()


def test_periphery_hydro_pipeline():
    """The reference's fullest pipeline (HP1...neigh_linker.cpp:1487-1493):
    contact + FENE-WCA + KMC + full RPY + no-slip periphery BIE. Chains
    stay confined and connected; trajectories finite through rebuilds."""
    R = 10.0
    sim = ChromatinSim(cfg(hydro="rpy_periphery", periphery_radius=R,
                           periphery_order=10, num_crosslinkers=16,
                           diffusion_coeff=0.1, num_steps=30))
    state = sim.init()
    state = sim.run_block(state, 30)
    assert not bool(state.overflow)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    r = np.linalg.norm(pos, axis=1)
    assert r.max() < R + 0.5  # confinement holds with hydro on
    bond = np.linalg.norm(np.diff(pos.reshape(2, 64, 3), axis=1), axis=-1)
    assert bond.max() < 1.5


def test_spectral_hydro_periodic_box():
    """Periodic-box chromatin with the spectral-Ewald Stokes mobility (the
    at-scale hydro mode, BASELINE config #5): chains stay connected and the
    trajectory stays finite through rebuilds."""
    sim = ChromatinSim(cfg(hydro="rpy_spectral", box_size=24.0,
                           num_steps=15, num_crosslinkers=16))
    state = sim.init()
    assert not bool(state.overflow)
    state = sim.run_block(state, 15)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert (pos >= 0).all() and (pos <= 24.0).all()
    assert not bool(state.overflow)
    # backbone intact under the periodic metric
    c = sim.config
    import jax.numpy as jnp
    sep = sim.metric.sep(state.pos[np.asarray(sim.bond_i)],
                         state.pos[np.asarray(sim.bond_j)])
    L = np.asarray(jnp.linalg.norm(sep, axis=-1))
    assert L.max() < c.backbone_rmax * 2 * c.bead_radius


def test_kmc_candidate_compaction_overflow_flagged():
    """The compacted KMC candidate rows (kmc_K slots, not the raw 27-cell
    stencil) must flag overflow when more beads sit inside capture+skin
    than the row capacity — the regrow loop's growth signal."""
    c = cfg(num_crosslinkers=4)
    sim = ChromatinSim(c)
    # undersized row capacity (the pre-regrow condition; at test sizes the
    # analytic bound caps at N, where overflow is impossible by pigeonhole)
    sim.kmc_K = 32
    state = sim.init()
    pos = np.asarray(state.pos).copy()
    home = int(np.asarray(state.xl_home)[0])
    # park a cluster of kmc_K + 8 beads inside the capture radius of home
    # (random directions, radius in [0.3, 0.9] * capture)
    rng = np.random.default_rng(0)
    m = sim.kmc_K + 8
    others = [i for i in range(sim.N) if i != home][:m]
    u = rng.normal(size=(m, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = sim.kmc_capture * rng.uniform(0.3, 0.9, size=(m, 1))
    pos[others] = pos[home] + u * r
    nmat, ovf = sim._build_kmc_candidates(jnp.asarray(pos), state.xl_home)
    assert bool(ovf)
    # rows stay well-formed: masked slots hold real bead indices
    idx = np.asarray(nmat.idx)[0][np.asarray(nmat.mask)[0]]
    assert ((idx >= 0) & (idx < sim.N)).all()


def test_binding_selector_restricts_targets():
    """Part algebra drives KMC: with a hetero/euchro split, crosslinkers
    home on and bind only `binding_selector` beads (the reference's hp1-h
    vs hp1-bs search split)."""
    cfg = ChromatinConfig(num_chains=2, beads_per_chain=64, num_crosslinkers=48,
                          hetero_fraction=0.5, binding_selector="hetero",
                          binding_rate=500.0, unbinding_rate=0.0,
                          diffusion_coeff=0.05, dt=2e-4, num_steps=150,
                          dtype="float64", chunk=256, log_every=1000)
    sim = ChromatinSim(cfg)
    state = sim.init()
    per = cfg.beads_per_chain
    hetero = (np.arange(sim.N) % per) < per // 2
    assert hetero[np.asarray(state.xl_home)].all()
    state = sim.run_block(state, 150)
    st = np.asarray(state.xl_state)
    bt = np.asarray(state.xl_bound_to)
    assert (st == BINDING_STATE.DOUBLY_BOUND).any()  # rate high: some bind
    bound = bt[st == BINDING_STATE.DOUBLY_BOUND]
    assert hetero[bound].all()  # never a euchro target
    # the complement selector works too
    from mundy_tpu.state.select import select
    eu = np.asarray(select(sim.beads, "!hetero"))
    assert not eu[bound].any()


def test_periphery_spectral_matches_dense():
    """hydro="rpy_periphery_spectral" (free-space spectral ambient + BIE
    correction) reproduces the dense rpy_periphery velocities on a confined
    config and runs stably."""
    kw = dict(num_chains=2, beads_per_chain=48, num_crosslinkers=16,
              periphery_radius=8.0, periphery_order=8,
              diffusion_coeff=0.0, dt=1e-4, num_steps=20,
              max_neighbors=64, cell_capacity=64,
              dtype="float64", chunk=256, log_every=1000)
    sim_d = ChromatinSim(ChromatinConfig(hydro="rpy_periphery", **kw))
    sim_s = ChromatinSim(ChromatinConfig(hydro="rpy_periphery_spectral", **kw))
    state_d = sim_d.init()
    state_s = sim_s.init()
    np.testing.assert_allclose(np.asarray(state_d.pos),
                               np.asarray(state_s.pos), atol=0)

    # one step from the identical start: velocities (= dpos/dt) must agree
    # to the spectral tolerance
    s_d = sim_d.run_block(state_d, 1)
    s_s = sim_s.run_block(state_s, 1)
    dp_d = np.asarray(s_d.pos - state_d.pos)
    dp_s = np.asarray(s_s.pos - state_s.pos)
    scale = np.abs(dp_d).max()
    assert np.abs(dp_s - dp_d).max() < 2e-3 * scale, (
        np.abs(dp_s - dp_d).max() / scale)

    # a longer spectral run stays finite and confined
    s_s = sim_s.run_block(s_s, 20)
    assert not bool(s_s.overflow)
    p = np.asarray(s_s.pos)
    assert np.isfinite(p).all()
    assert (np.linalg.norm(p, axis=1) < 8.5).all()
