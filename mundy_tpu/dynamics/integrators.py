"""Explicit integrators: node Euler + rigid-body quaternion update.

ref: integrate_positions_node_euler (HP1 driver `:1523`), NodeEuler
(`scrap/motion/include/mundy_motion/`). Quaternion update uses the exact
exponential map (mundy_tpu.math.quaternion.quat_integrate) — norm-preserving,
unlike the reference's normalize-after-Euler.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

from mundy_tpu.geom.periodicity import Metric
from mundy_tpu.math.quaternion import quat_integrate


def euler_step(pos: Array, vel: Array, dt, metric: Optional[Metric] = None) -> Array:
    """x <- x + dt v, wrapped into the periodic cell if a metric is given."""
    out = pos + dt * vel
    if metric is not None:
        out = metric.wrap(out)
    return out


def euler_step_rigid(
    pos: Array, quat: Array, vel: Array, omega: Array, dt,
    metric: Optional[Metric] = None,
):
    """Translate + rotate one explicit step; returns (pos, quat)."""
    return euler_step(pos, vel, dt, metric), quat_integrate(quat, omega, dt)
