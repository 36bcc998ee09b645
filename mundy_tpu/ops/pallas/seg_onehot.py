"""Pallas TPU kernel: strided-block one-hot segmented reduction.

The XLA blocked one-hot segment sum (ops/segments.segment_sum_sorted_blocked)
materializes its (B, W) one-hot operands in HBM — ~1 GB of bf16 traffic per
Delassus apply at 1M bodies — because XLA cannot fuse a compare into an MXU
operand. This kernel builds the one-hot in VMEM, where it lives only for the
three split-term matmuls, and reads/writes just the value planes: per block
~12 KB of HBM traffic instead of ~1 MB of one-hot.

Layout contract (the STRIDED active-pair layout, constraints/collision
.active_pair_subset_strided): pairs of body block b = bodies [b*B, (b+1)*B)
occupy slots [b*W, b*W + count_b) of every per-pair array — block windows
have STATIC offsets, so no dynamic slicing is needed (Pallas BlockSpecs are
block-aligned). `loc` carries the local body id (pairs.i - b*B) with
anything outside [0, B) structurally dropped (its one-hot row is all zero,
so — unlike the windowed XLA path — pad VALUES need not be zeroed).

Precision: the one-hot is exact in bf16; values go through the same
hi/mid/lo three-term bf16 split as the XLA path (full 24-bit f32 mantissa,
~1-2 ulp f32 per summand — the 2-term split's ~2^-17 error was the BBPGD
residual floor at 1M bodies, see segments.py).

ref: the force-assembly primitive of the LCP collision path
(`scrap/lcp_spheres/StkNgpLCP.cpp:578` sum_collision_force).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(B, W, v_ref, loc_ref, out_ref):
    # one-hot (W, B): sublane w matches lane loc[w]; loc outside [0, B)
    # matches nothing
    lanes = jax.lax.broadcasted_iota(jnp.int32, (W, B), 1)
    oh = (loc_ref[0, 0][:, None] == lanes).astype(jnp.bfloat16)

    v = v_ref[0]  # (3, W) f32
    hi = v.astype(jnp.bfloat16)
    rem = v - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(hi, oh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(mid, oh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(lo, oh, preferred_element_type=jnp.float32)
    out_ref[0] = acc  # (3, B)


def strided_onehot_segment_sum(
    values: Array,  # (nb, 3, W) f32 value planes (transposed pair vectors)
    loc: Array,  # (nb, W) int32 local segment ids; outside [0, B) dropped
    block_segments: int,  # B
    interpret: bool = False,
) -> Array:
    """Per-block segmented reduction -> (nb, 3, B) f32.

    out[b, :, s] = sum over w with loc[b, w] == s of values[b, :, w].
    """
    nb, three, W = values.shape
    assert three == 3
    B = block_segments
    if W % 8 != 0 or B % 128 != 0:
        raise ValueError(f"need W % 8 == 0 and B % 128 == 0, got {W=} {B=}")

    kern = functools.partial(_kernel, B, W)
    # loc rides as (nb, 1, W): Pallas requires the last two block dims
    # divisible by (8, 128) OR equal to the array dims — (1, W) satisfies
    # the equality clause where a 2-D (nb, W) block of (1, W) would not
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, B), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 3, B), jnp.float32),
        interpret=interpret,
    )(values, loc.reshape(nb, 1, W))


def _t_kernel(B, W, g_ref, n_ref, loc_ref, t_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (W, B), 1)
    oh = (loc_ref[0, 0][:, None] == lanes).astype(jnp.bfloat16)  # (W, B)
    n = n_ref[0]  # (3, W) f32
    g = g_ref[0, 0]  # (W,) f32
    v = -(n * g[None, :])  # contribution of each pair to F_i
    # assembly: F_local (3, B) with the 3-term bf16 split (full f32 mantissa)
    hi = v.astype(jnp.bfloat16)
    rem = v - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(hi, oh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(mid, oh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(lo, oh, preferred_element_type=jnp.float32)
    # extraction: F_i per pair = acc[:, loc] via the SAME one-hot (exact),
    # again split so the bf16 matmuls carry the full f32 mantissa
    ahi = acc.astype(jnp.bfloat16)
    arem = acc - ahi.astype(jnp.float32)
    amid = arem.astype(jnp.bfloat16)
    alo = (arem - amid.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))  # contract the B axes: (3,B)x(W,B)->(3,W)
    fi = jax.lax.dot_general(ahi, oh, dn, preferred_element_type=jnp.float32)
    fi = fi + jax.lax.dot_general(amid, oh, dn,
                                  preferred_element_type=jnp.float32)
    fi = fi + jax.lax.dot_general(alo, oh, dn,
                                  preferred_element_type=jnp.float32)
    t_ref[0, 0] = -jnp.sum(n * fi, axis=0)


def strided_onehot_t(
    gamma: Array,  # (nb, W) f32 multipliers (zero on padded slots)
    normals: Array,  # (nb, 3, W) f32 unit normals (pad rows ignored)
    loc: Array,  # (nb, W) int32 local body ids; outside [0, B) dropped
    block_segments: int,  # B
    interpret: bool = False,
) -> Array:
    """Fused i-side Delassus half-apply -> t (nb, W) f32.

    t_p = -n_p . F_{i(p)} with F_i = sum_{p' in block, i(p')=i} -gamma n —
    both the segmented assembly and the per-pair extraction ride ONE VMEM
    one-hot (two matmul families), so a scalar-mobility Delassus iteration
    needs no global (A, 3) gathers at all: with U = c F,
        sdot_p = c_i t_p + c_j t_{dual(p)}
    where dual(p) is the (j, i) duplicate's slot (see
    constraints/collision.pair_dual_slots). Padded slots yield t = 0.

    ref: fuses sum_collision_force + the i-side of
    compute_rate_of_change_of_sep (`scrap/lcp_spheres/StkNgpLCP.cpp:578,635`).
    """
    nb, three, W = normals.shape
    assert three == 3
    B = block_segments
    if W % 8 != 0 or B % 128 != 0:
        raise ValueError(f"need W % 8 == 0 and B % 128 == 0, got {W=} {B=}")
    kern = functools.partial(_t_kernel, B, W)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, W), jnp.float32),
        interpret=interpret,
    )(gamma.reshape(nb, 1, W), normals,
      loc.reshape(nb, 1, W)).reshape(nb, W)


def seg_onehot_vmem_ok(window: int, block_segments: int,
                       budget: float = 12e6) -> bool:
    """The kernel's VMEM high-water estimate: the (W, B) bf16 one-hot plus
    bf16 split terms and the f32 in/out blocks (all small next to the
    one-hot), against a conservative budget."""
    W, B = window, block_segments
    onehot = W * B * 2
    small = 4 * 3 * W * 4 + 3 * B * 4 + W * 4
    return onehot + small <= budget
