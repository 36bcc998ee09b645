"""Checkpoint round-trip, VTK writers, KMC statistics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.io import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    write_vtk_points,
    write_xyz,
)
from mundy_tpu.kmc import (
    BINDING_STATE,
    binding_rate_gaussian,
    crosslinker_kmc_step,
    kmc_bind_events,
    kmc_unbind_events,
)


# ------------------------------------------------------------- checkpoints
def test_checkpoint_round_trip(tmp_path):
    from mundy_tpu.driver.apps.spheres import SpheresConfig, SpheresSim

    cfg = SpheresConfig(num_spheres=50, box_size=10.0, dtype="float64",
                        chunk=256, num_steps=5)
    sim = SpheresSim(cfg)
    state = sim.run_block(sim.init(), 5)
    p = save_checkpoint(str(tmp_path), 5, state, metadata={"note": "test"})
    assert os.path.exists(p)
    assert latest_checkpoint(str(tmp_path)) == p

    template = sim.init()  # fresh state with same structure
    restored = load_checkpoint(p, template)
    np.testing.assert_array_equal(np.asarray(restored.pos), np.asarray(state.pos))
    assert int(restored.step) == int(state.step)

    # continue from restored state = continue from original (determinism)
    s1 = sim.run_block(state, 3)
    s2 = sim.run_block(restored, 3)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_checkpoint_multiple_latest(tmp_path):
    x = {"a": jnp.arange(3.0)}
    save_checkpoint(str(tmp_path), 1, x)
    save_checkpoint(str(tmp_path), 20, x)
    save_checkpoint(str(tmp_path), 3, x)
    assert "ckpt_000000000020" in latest_checkpoint(str(tmp_path))


def test_checkpoint_shape_mismatch(tmp_path):
    p = save_checkpoint(str(tmp_path), 0, {"a": jnp.arange(3.0)})
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(p, {"a": jnp.arange(4.0)})


# -------------------------------------------------------------------- vtk
def test_vtk_and_xyz(tmp_path, rng):
    pos = rng.normal(size=(10, 3))
    vp = str(tmp_path / "f.vtk")
    write_vtk_points(vp, pos, point_data={"radius": np.ones(10), "vel": pos})
    txt = open(vp).read()
    assert "POINTS 10 float" in txt and "VECTORS vel float" in txt

    xp = str(tmp_path / "t.xyz")
    write_xyz(xp, pos)
    write_xyz(xp, pos, append=True)
    lines = open(xp).read().strip().splitlines()
    assert lines[0] == "10" and len(lines) == 24


# -------------------------------------------------------------------- kmc
def test_binding_rate_formula():
    # at rest length: z = A
    z = binding_rate_gaussian(jnp.asarray(2.0), 10.0, 2.0, 1.0, 5.0)
    assert np.isclose(float(z), 5.0)
    # symmetric around r0, decreasing away
    z1 = binding_rate_gaussian(jnp.asarray(2.5), 10.0, 2.0, 1.0, 5.0)
    z2 = binding_rate_gaussian(jnp.asarray(1.5), 10.0, 2.0, 1.0, 5.0)
    assert np.isclose(float(z1), float(z2))
    assert float(z1) < 5.0
    np.testing.assert_allclose(float(z1), 5.0 * np.exp(-0.5 * 10 * 0.25), rtol=1e-6)


def test_kmc_bind_statistics():
    """Empirical binding frequency ~ 1 - exp(-Z)."""
    X, K = 20000, 4
    rates = jnp.full((X, K), 2.0)
    mask = jnp.ones((X, K), bool)
    dt = 0.05  # Z = 0.4 -> P = 0.3297
    key = jax.random.PRNGKey(0)
    do_bind, chosen = kmc_bind_events(key, jnp.asarray(0), rates, mask, dt)
    p_emp = float(jnp.mean(do_bind))
    assert np.isclose(p_emp, 1 - np.exp(-0.4), atol=0.01)
    # uniform rates -> uniform choice among K
    counts = np.bincount(np.asarray(chosen)[np.asarray(do_bind)], minlength=K)
    assert counts.min() > 0.8 * counts.max()


def test_kmc_bind_respects_mask():
    X, K = 1000, 4
    rates = jnp.full((X, K), 100.0)
    mask = jnp.zeros((X, K), bool).at[:, 2].set(True)
    do_bind, chosen = kmc_bind_events(jax.random.PRNGKey(1), jnp.asarray(0),
                                      rates, mask, 1.0)
    assert bool(jnp.all(chosen[do_bind] == 2))
    # no candidates -> never bind
    none_mask = jnp.zeros((X, K), bool)
    do_bind2, _ = kmc_bind_events(jax.random.PRNGKey(1), jnp.asarray(0),
                                  rates, none_mask, 1.0)
    assert not bool(jnp.any(do_bind2))


def test_kmc_unbind_statistics():
    X = 50000
    koff = jnp.full((X,), 3.0)
    dt = 0.1  # P = 1 - exp(-0.3) = 0.2592
    ub = kmc_unbind_events(jax.random.PRNGKey(2), jnp.asarray(0), koff, dt)
    assert np.isclose(float(jnp.mean(ub)), 1 - np.exp(-0.3), atol=0.01)


def test_crosslinker_state_machine():
    X, K = 6, 3
    state = jnp.asarray([BINDING_STATE.LEFT_BOUND] * 3 +
                        [BINDING_STATE.DOUBLY_BOUND] * 3, jnp.int32)
    bound_to = jnp.asarray([-1, -1, -1, 7, 8, 9], jnp.int32)
    cand_idx = jnp.tile(jnp.asarray([[4, 5, 6]], jnp.int32), (X, 1))
    # huge rates -> left-bound always bind; huge koff -> doubly always unbind
    rates = jnp.full((X, K), 1e6)
    mask = jnp.ones((X, K), bool)
    out = crosslinker_kmc_step(jax.random.PRNGKey(3), jnp.asarray(0), state,
                               bound_to, cand_idx, rates, mask,
                               koff=1e6, dt=1.0)
    s = np.asarray(out.state)
    b = np.asarray(out.bound_to)
    assert (s[:3] == BINDING_STATE.DOUBLY_BOUND).all()
    assert set(b[:3]).issubset({4, 5, 6})
    assert (s[3:] == BINDING_STATE.LEFT_BOUND).all()
    assert (b[3:] == -1).all()


# ------------------------------------------------------------ native fastio
def test_native_trajectory_round_trip(tmp_path, rng):
    from mundy_tpu.io.native import library
    from mundy_tpu.io.trajectory import TrajectoryReader, TrajectoryWriter

    assert library() is not None  # g++ is baked into this image
    path = str(tmp_path / "t.mtrj")
    frames = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(5)]
    with TrajectoryWriter(path, 50) as w:
        for i, f in enumerate(frames):
            w.write(i * 10, i * 0.1, f)
    r = TrajectoryReader(path)
    assert r.num_frames == 5 and r.n == 50
    for i, f in enumerate(frames):
        step, time, pos = r.read(i)
        assert step == i * 10
        np.testing.assert_allclose(time, i * 0.1)
        np.testing.assert_array_equal(pos, f)
    r.close()


def test_native_trajectory_crc_detects_corruption(tmp_path, rng):
    from mundy_tpu.io.trajectory import TrajectoryReader, TrajectoryWriter

    path = str(tmp_path / "c.mtrj")
    with TrajectoryWriter(path, 10) as w:
        w.write(0, 0.0, rng.normal(size=(10, 3)).astype(np.float32))
    # flip a payload byte
    data = bytearray(open(path, "rb").read())
    data[-5] ^= 0xFF
    open(path, "wb").write(bytes(data))
    r = TrajectoryReader(path)
    with pytest.raises(IOError, match="CRC"):
        r.read(0)


def test_native_hilbert_keys_match_jax(rng):
    from mundy_tpu.io.trajectory import hilbert_keys_native
    from mundy_tpu.math.spacefill import hilbert_key_3d

    pos = rng.uniform(0, 10, (500, 3))
    keys_c = hilbert_keys_native(pos, [0, 0, 0], [10, 10, 10], bits=8)
    assert keys_c is not None
    cells = np.clip((pos / 10 * 256).astype(np.int64), 0, 255)
    keys_j = np.asarray(hilbert_key_3d(jnp.asarray(cells[:, 0]),
                                       jnp.asarray(cells[:, 1]),
                                       jnp.asarray(cells[:, 2]), bits=8))
    np.testing.assert_array_equal(keys_c, keys_j)
