"""LCP/CQPP solver vs manufactured analytic solutions.

Mirrors reference `mundy/math/tests/unit_tests/UnitTestConvex.cpp`
(`:174,553-617`): construct (x*, w*) with complementary supports, derive
q = w* - A x*, solve, and check `x ≈ x*` to ~10x solver tolerance. Runs both
the "per-pair" (vmapped) and "device-global" instantiations, matching the
reference's MundyMath and Kokkos backends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.math import PGDConfig, bounded, solve_cqpp, solve_lcp


def manufactured_lcp(rng, n):
    """Random SPD A; half the entries active (x*>0, w*=0), half inactive."""
    B = rng.normal(size=(n, n))
    A = B @ B.T + n * np.eye(n)  # well-conditioned SPD
    x_star = np.zeros(n)
    w_star = np.zeros(n)
    active = rng.permutation(n) < n // 2
    x_star[active] = rng.uniform(0.5, 2.0, size=active.sum())
    w_star[~active] = rng.uniform(0.5, 2.0, size=(~active).sum())
    q = w_star - A @ x_star
    return jnp.asarray(A), jnp.asarray(q), x_star, w_star


@pytest.mark.parametrize("bb_rule", ["bb1", "bb2", "alternating"])
def test_lcp_manufactured(rng, bb_rule):
    A, q, x_star, _ = manufactured_lcp(rng, 20)
    cfg = PGDConfig(max_iters=5000, tol=1e-6, bb_rule=bb_rule)
    res = solve_lcp(lambda x: A @ x, q, config=cfg)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_star, atol=1e-5)
    # complementarity: x >= 0, Ax + q >= 0, x.(Ax+q) = 0
    w = A @ res.x + q
    assert float(jnp.min(res.x)) >= -1e-12
    assert float(jnp.min(w)) >= -1e-6
    assert abs(float(jnp.dot(res.x, w))) < 1e-4


def test_lcp_projected_diff_residual(rng):
    A, q, x_star, _ = manufactured_lcp(rng, 12)
    cfg = PGDConfig(max_iters=5000, tol=1e-6, residual="projected_diff")
    res = solve_lcp(lambda x: A @ x, q, config=cfg)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_star, atol=1e-5)


def test_cqpp_bounded_analytic():
    # min 1/2 x'Ax + q'x with A=I, q=(-2, 2), box [0,1]^2
    # unconstrained solution (2, -2) -> projected solution (1, 0)
    A = jnp.eye(2)
    q = jnp.array([-2.0, 2.0])
    res = solve_cqpp(lambda x: A @ x, q, bounded(jnp.zeros(2), jnp.ones(2)),
                     config=PGDConfig(max_iters=500, tol=1e-10))
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, [1.0, 0.0], atol=1e-10)


def test_lcp_trivially_feasible(rng):
    # q >= 0 -> x* = 0 and the solver should exit immediately
    A, _, _, _ = manufactured_lcp(rng, 8)
    q = jnp.asarray(np.abs(rng.normal(size=8)) + 0.1)
    res = solve_lcp(lambda x: A @ x, q, config=PGDConfig(tol=1e-10))
    assert bool(res.converged)
    assert int(res.num_iters) == 0
    np.testing.assert_allclose(res.x, np.zeros(8), atol=1e-14)


def test_lcp_vmapped_per_pair(rng):
    """The 'in-kernel' instantiation: many small LCPs in lockstep."""
    batch = 64
    n = 4
    As, qs, xs = [], [], []
    for _ in range(batch):
        A, q, x_star, _ = manufactured_lcp(rng, n)
        As.append(A), qs.append(q), xs.append(x_star)
    As, qs = jnp.stack(As), jnp.stack(qs)
    xs = np.stack(xs)

    cfg = PGDConfig(max_iters=2000, tol=1e-5)

    def solve_one(A, q):
        return solve_lcp(lambda x: A @ x, q, config=cfg)

    res = jax.jit(jax.vmap(solve_one))(As, qs)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(res.x, xs, atol=1e-4)


def test_lcp_degenerate_alpha0_still_converges(rng):
    """A warm-started solve fed a garbage-small alpha0 (a converged solve's
    final BB step is tail noise once dx is in the rounding regime) must NOT
    false-stall: the first no-movement iteration resets alpha to the
    cold-start 1/res rule and the solve runs to tolerance. Regression for a
    0.13 trajectory divergence: the single-chip LCP app fed each solve's
    final alpha forward and step 2 exited after 2 iterations at residual
    3.8e-2 with gamma frozen at the (stale) warm start."""
    A, q, x_star, _ = manufactured_lcp(rng, 10)
    cfg = PGDConfig(max_iters=5000, tol=1e-8)
    # near-solution warm start + degenerate alpha0: projection pins most
    # entries, the tiny step moves nothing, stall machinery must recover
    x0 = jnp.asarray(x_star) * (1.0 + 1e-4)
    res = solve_lcp(lambda x: A @ x, q, x0=x0, config=cfg,
                    alpha0=jnp.asarray(1e-12))
    assert bool(res.converged), float(res.residual)
    np.testing.assert_allclose(res.x, x_star, atol=1e-6)
    # the reported alpha must be a usable curvature estimate, not tail noise
    assert 1e-6 < float(res.alpha) < 1e6


def test_lcp_masked_padding(rng):
    """Padded slots must not perturb the active sub-solve."""
    A, q, x_star, _ = manufactured_lcp(rng, 10)
    cap = 16
    A_pad = jnp.zeros((cap, cap)).at[:10, :10].set(A)
    q_pad = jnp.ones(cap).at[:10].set(q)  # garbage in padding
    mask = jnp.arange(cap) < 10
    cfg = PGDConfig(max_iters=5000, tol=1e-6)
    res = solve_lcp(lambda x: A_pad @ x, q_pad, config=cfg, mask=mask)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x[:10], x_star, atol=1e-5)
    np.testing.assert_allclose(res.x[10:], np.zeros(6), atol=1e-14)


def test_lcp_patience_exit_at_residual_floor(rng):
    """A tolerance below the dtype's achievable residual floor must exit via
    the patience rule (no meaningful best-residual improvement for
    `patience` iterations), NOT spin to max_iters. Regression for the 1M
    LCP worker kill: at 1M active constraints the f32 residual floor
    (~3e-5) sits above the 1e-5 tol, and a 10000-iteration frozen solve was
    a single multi-minute device execution."""
    A, q, x_star, _ = manufactured_lcp(rng, 32)
    # f32 + unreachable tolerance -> the solve floors, patience must fire
    A32 = jnp.asarray(A, jnp.float32)
    q32 = jnp.asarray(q, jnp.float32)
    cfg = PGDConfig(max_iters=10_000, tol=1e-14, patience=100)
    res = solve_lcp(lambda x: A32 @ x, q32, config=cfg)
    assert int(res.num_iters) < 2_000, int(res.num_iters)
    assert not bool(res.converged)
    # the returned iterate is still the best one found: solution-quality
    # at the f32 floor
    np.testing.assert_allclose(res.x, x_star, atol=1e-3)


def test_lcp_patience_does_not_cut_converging_solves(rng):
    """A healthy solve (reachable tolerance) must converge exactly as
    before with the default patience."""
    A, q, x_star, _ = manufactured_lcp(rng, 16)
    cfg = PGDConfig(max_iters=5000, tol=1e-8)
    res = solve_lcp(lambda x: A @ x, q, config=cfg)
    assert bool(res.converged), float(res.residual)
    np.testing.assert_allclose(res.x, x_star, atol=1e-6)
