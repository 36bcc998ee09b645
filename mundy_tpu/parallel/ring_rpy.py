"""Ring-rotated dense RPY mobility over a device mesh.

The long-range hydrodynamics analog of ring attention (SURVEY.md §5): the
O(N^2) RPY product U = M F is sharded by rotating (source position, source
force) blocks around the ICI ring with `ppermute` while each chip
accumulates its local targets' partial sums — O(N^2 / D) pairwise work per
chip, comm overlapped with the next block's compute by XLA's scheduler.

Replaces the reference's single-device team-parallel RPY sum
(`StkNgpLCP.cpp:370-390`) at scales where one chip can't hold or afford the
full O(N^2) sweep; the PVFMM/STKFMM path of the reference (TPLsList.cmake
EX entries) is the tree-based alternative, this is the dense one.
"""

from __future__ import annotations

import math as _math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mundy_tpu.mobility.rpy import _rpy_pair_velocity, rpy_self_mobility


def _rpy_block(tgt_pos: Array, src_pos: Array, src_f: Array, radius, viscosity,
               exclude_diagonal: bool, overlap_correction: bool,
               chunk: int = 512) -> Array:
    """Partial U for all targets against one source block (chunked)."""
    n_t = tgt_pos.shape[0]
    n_pad = ((n_t + chunk - 1) // chunk) * chunk
    pad = n_pad - n_t
    tgt_p = jnp.concatenate([tgt_pos, jnp.zeros((pad, 3), tgt_pos.dtype)], axis=0)

    def one_chunk(start):
        tgt = jax.lax.dynamic_slice_in_dim(tgt_p, start, chunk, axis=0)
        rvec = tgt[:, None, :] - src_pos[None, :, :]
        u = _rpy_pair_velocity(rvec, src_f[None, :, :], radius, viscosity,
                               overlap_correction)
        if exclude_diagonal:
            me = start + jnp.arange(chunk)
            same = me[:, None] == jnp.arange(src_pos.shape[0])[None, :]
            u = jnp.where(same[..., None], 0.0, u)
        return jnp.sum(u, axis=1)

    starts = jnp.arange(0, n_pad, chunk)
    return jax.lax.map(one_chunk, starts).reshape(n_pad, 3)[:n_t]


def make_ring_rpy_apply(
    mesh: Mesh,
    axis: str,
    radius: float,
    viscosity: float,
    include_self: bool = True,
    overlap_correction: bool = False,
    chunk: int = 512,
) -> Callable[[Array, Array], Array]:
    """Returns apply(pos, forces) -> velocities with pos/forces sharded
    P(axis) over `mesh`: the distributed dense RPY product."""
    d = mesh.shape[axis]

    def local_apply(pos_local, f_local):
        n_local = pos_local.shape[0]
        perm = [(i, (i + 1) % d) for i in range(d)]

        def body(step, carry):
            u, src_pos, src_f = carry
            # on step 0 the sources are our own block: exclude i == i
            u = u + jax.lax.cond(
                step == 0,
                lambda: _rpy_block(pos_local, src_pos, src_f, radius, viscosity,
                                   True, overlap_correction, chunk),
                lambda: _rpy_block(pos_local, src_pos, src_f, radius, viscosity,
                                   False, overlap_correction, chunk),
            )
            src_pos = jax.lax.ppermute(src_pos, axis, perm)
            src_f = jax.lax.ppermute(src_f, axis, perm)
            return (u, src_pos, src_f)

        u0 = jnp.zeros_like(pos_local)
        u, _, _ = jax.lax.fori_loop(0, d, body, (u0, pos_local, f_local))
        if include_self:
            u = u + rpy_self_mobility(f_local, radius, viscosity)
        return u

    return jax.jit(
        jax.shard_map(local_apply, mesh=mesh, in_specs=(P(axis), P(axis)),
                      out_specs=P(axis), check_vma=False)
    )


def hilbert_shard_permutation(pos: np.ndarray, domain_low, domain_high,
                              bits: int = 10) -> np.ndarray:
    """Load-balance permutation: sort particles along the Hilbert curve so
    equal contiguous chunks map to shards with spatial locality.

    The `stk::balance` RCB analog (SURVEY.md §2.7): re-invoke periodically
    and re-deal arrays by the returned permutation.
    """
    from mundy_tpu.math.spacefill import hilbert_key_3d

    lo = np.asarray(domain_low, np.float64)
    hi = np.asarray(domain_high, np.float64)
    frac = (np.asarray(pos, np.float64) - lo) / (hi - lo)
    cells = np.clip((frac * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    keys = np.asarray(hilbert_key_3d(
        jnp.asarray(cells[:, 0]), jnp.asarray(cells[:, 1]), jnp.asarray(cells[:, 2]),
        bits=bits))
    return np.argsort(keys, kind="stable")
