"""Blocked sorted-id segmented reduction (ops/segments.py) vs segment_sum."""

import jax
import jax.numpy as jnp
import numpy as np

from mundy_tpu.ops.segments import segment_sum_sorted_blocked, segment_windows


def _case(rng, n, mean, B, W, capacity):
    counts = rng.poisson(mean, n)
    ids = np.repeat(np.arange(n), counts)
    ids = ids[:capacity] if ids.size >= capacity else np.pad(
        ids, (0, capacity - ids.size), constant_values=n)
    ids = np.sort(ids)
    vals = rng.normal(size=(capacity, 3))
    vals[ids >= n] = 0.0
    return jnp.asarray(ids, jnp.int32), jnp.asarray(vals)


def test_matches_segment_sum(rng):
    n, B, W, cap = 1000, 64, 256, 2048
    ids, vals = _case(rng, n, 1.3, B, W, cap)
    win = segment_windows(ids, n, B, W)
    assert not bool(win.overflow)
    out = segment_sum_sorted_blocked(vals, ids, n, win)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n + 1)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_f32_bf16_split_accuracy(rng):
    """The f32 path reduces via a 3-term bf16 hi/mid/lo MXU dot that
    recovers the full 24-bit f32 mantissa (~1-2 ulp per summand). All
    terms sit behind optimization barriers, so this exercises the real
    MXU-path rounding even on CPU (where XLA would otherwise fold the
    f32->bf16->f32 round trip away and the test would vacuously pass).
    The tight tolerance is the point: the 2-term split's ~2^-17 relative
    error was the BBPGD residual floor at 1M bodies."""
    n, B, W, cap = 1000, 64, 256, 2048
    ids, vals = _case(rng, n, 1.3, B, W, cap)
    vals32 = vals.astype(jnp.float32)
    win = segment_windows(ids, n, B, W)
    out = segment_sum_sorted_blocked(vals32, ids, n, win)
    assert out.dtype == jnp.float32
    ref = jax.ops.segment_sum(vals, ids, num_segments=n + 1)[:n]
    scale = float(jnp.max(jnp.abs(vals)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-7 * scale)


def test_windows_from_body_starts_match_searchsorted(rng):
    """The body-starts gather path (one (nb+1,)-row gather, replacing a
    28 ms serial searchsorted at 1M on v5e) must reproduce the windows
    exactly — including with a truncated (overflowed) list."""
    n, B, W, cap = 1000, 64, 256, 2048
    counts = rng.poisson(1.3, n)
    body_starts = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)]), jnp.int32)
    ids = np.repeat(np.arange(n), counts)
    for capacity in (cap, int(ids.size * 0.7)):  # full + truncated
        idc = np.sort(ids)[:capacity]
        idc = np.pad(idc, (0, max(0, capacity - idc.size)),
                     constant_values=n)
        idj = jnp.asarray(idc, jnp.int32)
        ref = segment_windows(idj, n, B, W)
        got = segment_windows(idj, n, B, W, body_starts=body_starts)
        np.testing.assert_array_equal(np.asarray(got.starts),
                                      np.asarray(ref.starts))
        assert bool(got.overflow) == bool(ref.overflow)


def test_window_overflow_flags(rng):
    n, B, cap = 256, 32, 1024
    # everything piled on body 0: one block holds all pairs
    ids = jnp.asarray(np.sort(np.zeros(900, np.int32).tolist() +
                              [n] * (cap - 900)), jnp.int32)
    win = segment_windows(ids, n, B, 512)
    assert bool(win.overflow)
    win2 = segment_windows(ids, n, B, 1024)
    assert not bool(win2.overflow)


def test_pad_run_not_counted(rng):
    """Trailing pads (id == n) must not count into the last block."""
    n, B = 64, 32
    ids = jnp.asarray([0, 1, 5, 63] + [n] * 100, jnp.int32)
    win = segment_windows(ids, n, B, 8)
    assert not bool(win.overflow)
    vals = jnp.zeros((104, 3)).at[:4].set(1.0)
    out = segment_sum_sorted_blocked(vals, ids, n, win)
    assert float(out.sum()) == 12.0
