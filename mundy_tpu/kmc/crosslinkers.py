"""Vectorized KMC crosslinker state machine.

Semantics mirror the reference exactly (HP1 driver):

- state-change rate for a left-bound crosslinker to bind a candidate site:
      z_i = A * exp(-(1/2) * (k/kT) * (|dr| - r0)^2)
  (`compute_state_change_rate_left_to_doubly`, HP1 `:177-221`);
- per crosslinker: Z = dt * sum_i z_i; P(any bind) = 1 - exp(-Z); the
  individual event i is chosen with probability z_i/Z * (1 - exp(-Z)) by a
  single uniform draw against the running cumsum
  (`kmc_choose_state_left_bound`, HP1 `:223-296`);
- a doubly-bound crosslinker unbinds its right head with
  P = 1 - exp(-dt * koff) (`kmc_choose_state_doubly_bound`, HP1 `:304-346`).

The per-entity Philox(gid, counter) streams become threefry fold_in(key,
step) with one lane per crosslinker; topology edits (bind/unbind) are masked
index updates on a capacity-sized crosslinker table — no mesh modification
cycle needed (SURVEY.md §7 "masked binding-state updates").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class BINDING_STATE:
    """ref: BINDING_STATE_CHANGE enum in the HP1 driver."""

    UNBOUND = 0
    LEFT_BOUND = 1
    DOUBLY_BOUND = 2


def binding_rate_gaussian(dr_mag: Array, k_spring, rest_length, kt, rate_prefactor) -> Array:
    """z = A exp(-k (|dr| - r0)^2 / (2 kT)) — HP1 `:209-216`."""
    x = dr_mag - rest_length
    return rate_prefactor * jnp.exp(-0.5 * (k_spring / kt) * x * x)


def uniform_keyed(key: Array, step: Array, gid: Array, salt: int,
                  dtype=jnp.float32) -> Array:
    """Per-entity uniform draws as a pure function of (key, step, gid) —
    the counter-based construction of dynamics/brownian
    (threefry_2x32 over explicit (gid, salt) counter planes). Unlike a
    shape-(X,) jax.random.uniform, the stream is independent of array
    layout or sharding: a shard drawing its own gids gets exactly the
    values the single-device sweep draws for them (the property the
    reference gets from Philox(gid, counter) per-entity streams)."""
    import jax.extend as jex

    kd = jax.random.key_data(jax.random.fold_in(key, step))
    kd = kd.reshape(-1).astype(jnp.uint32)
    g = gid.reshape(-1).astype(jnp.uint32)
    m = g.shape[0]
    counts = jnp.concatenate([g, jnp.full((m,), np.uint32(salt))])
    bits = jex.random.threefry_2x32((kd[0], kd[1]), counts)
    u = (bits[:m] >> 9).astype(jnp.float32) * jnp.float32(2.0 ** -23) \
        + jnp.float32(2.0 ** -24)
    return u.reshape(gid.shape).astype(dtype)


def kmc_bind_events(
    key: Array,
    step: Array,
    rates: Array,  # (X, K) candidate binding rates (masked entries = 0)
    mask: Array,  # (X, K) candidate validity
    dt,
    gid: Array = None,  # (X,) int32 — keyed per-entity draws (sharding-
    #                     invariant streams); None = legacy shape-(X,) draw
) -> tuple[Array, Array]:
    """Choose at most one binding event per crosslinker.

    Returns (do_bind (X,) bool, chosen_col (X,) int32 into the K axis).
    Matches the reference's single-uniform-draw construction: with
    Z = dt * sum z_i, bind iff u < 1 - exp(-Z); the chosen candidate is the
    first j with u < cumsum_j [ (1-exp(-Z))/Z * dt * z_j ].
    """
    z = jnp.where(mask, rates, 0.0) * dt
    z_tot = jnp.sum(z, axis=1)
    if gid is not None:
        u = uniform_keyed(key, step, gid, 0x0B1D, dtype=rates.dtype)
    else:
        u = jax.random.uniform(jax.random.fold_in(key, step),
                               (rates.shape[0],), dtype=rates.dtype)
    p_any = -jnp.expm1(-z_tot)  # 1 - exp(-Z), accurate for small Z
    do_bind = (u < p_any) & (z_tot > 0)

    scale = jnp.where(z_tot > 0, p_any / jnp.maximum(z_tot, 1e-30), 0.0)
    cum = jnp.cumsum(z * scale[:, None], axis=1)
    hit = u[:, None] < cum
    chosen = jnp.argmax(hit, axis=1).astype(jnp.int32)
    return do_bind, chosen


def kmc_unbind_events(key: Array, step: Array, koff: Array, dt,
                      gid: Array = None) -> Array:
    """(X,) bool: unbind with P = 1 - exp(-dt koff) (HP1 `:310-340`)."""
    if gid is not None:
        u = uniform_keyed(key, step, gid, 0xB1ED, dtype=koff.dtype)
    else:
        u = jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(key, step), 0xB1ED),
            koff.shape, dtype=koff.dtype,
        )
    return u < -jnp.expm1(-dt * koff)


class CrosslinkerKMCResult(NamedTuple):
    state: Array  # (X,) int32 binding state
    bound_to: Array  # (X,) int32 target index of the right head (-1 if none)


def crosslinker_kmc_step(
    key: Array,
    step: Array,
    state: Array,  # (X,) int32
    bound_to: Array,  # (X,) int32
    candidate_idx: Array,  # (X, K) candidate target indices
    candidate_rates: Array,  # (X, K) binding rates (z_i)
    candidate_mask: Array,  # (X, K)
    koff: Array,  # (X,) or scalar unbinding rate
    dt,
    gid: Array = None,  # (X,) crosslinker global ids: keyed (sharding-
    #                     invariant) streams; None = legacy layout draws
) -> CrosslinkerKMCResult:
    """One KMC sweep: left-bound crosslinkers may bind, doubly-bound may
    unbind (mutually exclusive per entity per step, as in the reference's
    selector-split kernels)."""
    x = state.shape[0]
    koff = jnp.broadcast_to(jnp.asarray(koff, candidate_rates.dtype), (x,))

    left = state == BINDING_STATE.LEFT_BOUND
    doubly = state == BINDING_STATE.DOUBLY_BOUND

    do_bind, chosen = kmc_bind_events(key, step, candidate_rates,
                                      candidate_mask, dt, gid=gid)
    do_bind = do_bind & left
    new_target = jnp.take_along_axis(candidate_idx, chosen[:, None], axis=1)[:, 0]

    do_unbind = kmc_unbind_events(key, step, koff, dt, gid=gid) & doubly

    new_state = jnp.where(do_bind, BINDING_STATE.DOUBLY_BOUND, state)
    new_state = jnp.where(do_unbind, BINDING_STATE.LEFT_BOUND, new_state)
    new_bound = jnp.where(do_bind, new_target, bound_to)
    new_bound = jnp.where(do_unbind, -1, new_bound)
    return CrosslinkerKMCResult(state=new_state, bound_to=new_bound)
