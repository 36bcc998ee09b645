"""Space-filling curves, L-BFGS, linalg, containers, config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.core import (
    ConfigError,
    config_from_dict,
    pytree_dataclass,
    require,
    static_field,
)
from mundy_tpu.math import (
    cross,
    dot,
    hilbert_key_3d,
    hilbert_positions_and_directors,
    minimize_lbfgs,
    morton_key_3d,
    normalize,
)


# ---------------------------------------------------------------- spacefill
def test_morton_key_interleave():
    # Morton(1,0,0)=1, Morton(0,1,0)=2, Morton(0,0,1)=4, Morton(1,1,1)=7
    ix = jnp.array([1, 0, 0, 1])
    iy = jnp.array([0, 1, 0, 1])
    iz = jnp.array([0, 0, 1, 1])
    np.testing.assert_array_equal(morton_key_3d(ix, iy, iz), [1, 2, 4, 7])


def test_morton_key_unique_in_grid():
    n = 16
    g = jnp.arange(n)
    ix, iy, iz = jnp.meshgrid(g, g, g, indexing="ij")
    keys = np.asarray(morton_key_3d(ix.ravel(), iy.ravel(), iz.ravel()))
    assert len(np.unique(keys)) == n**3


def test_hilbert_key_locality_and_bijection():
    bits = 4
    n = 2**bits
    g = jnp.arange(n)
    ix, iy, iz = jnp.meshgrid(g, g, g, indexing="ij")
    keys = np.asarray(hilbert_key_3d(ix.ravel(), iy.ravel(), iz.ravel(), bits=bits))
    # bijection onto [0, n^3)
    assert len(np.unique(keys)) == n**3
    assert keys.min() == 0 and keys.max() == n**3 - 1
    # locality: consecutive keys differ by exactly one unit step in the grid
    coords = np.stack([np.asarray(v.ravel()) for v in (ix, iy, iz)], axis=1)
    order = np.argsort(keys)
    steps = np.abs(np.diff(coords[order], axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_positions_curve():
    pos, dirs = hilbert_positions_and_directors(64)
    assert pos.shape == (64, 3)
    assert dirs.shape == (63, 3)
    # every hop is one lattice unit
    hops = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    np.testing.assert_allclose(hops, 1.0, atol=1e-12)
    # all lattice sites visited exactly once
    assert len({tuple(p) for p in pos.round(9).tolist()}) == 64


# ---------------------------------------------------------------- L-BFGS
def test_lbfgs_quadratic():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.array([1.0, -2.0, 3.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = minimize_lbfgs(f, jnp.zeros(3), max_iters=100, f_delta_tol=1e-14)
    np.testing.assert_allclose(res.x, jnp.linalg.solve(A, b), atol=1e-6)


def test_lbfgs_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize_lbfgs(f, jnp.array([-1.2, 1.0]), max_iters=200, f_delta_tol=1e-16)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)


def test_lbfgs_vmapped():
    def f(x):
        return jnp.sum((x - jnp.array([1.0, 2.0])) ** 2)

    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(32, 2)))
    res = jax.jit(jax.vmap(lambda x0: minimize_lbfgs(f, x0, max_iters=50)))(x0s)
    np.testing.assert_allclose(res.x, np.tile([1.0, 2.0], (32, 1)), atol=1e-5)


def test_lbfgs_finite_difference():
    def f(x):
        return jnp.sum(x**2) + x[0] * x[1]

    res = minimize_lbfgs(f, jnp.array([3.0, -4.0]), use_autodiff=False, max_iters=100)
    np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-4)


# ---------------------------------------------------------------- linalg
def test_cross_and_dot(rng):
    a = jnp.asarray(rng.normal(size=(5, 3)))
    b = jnp.asarray(rng.normal(size=(5, 3)))
    np.testing.assert_allclose(cross(a, b), np.cross(a, b), atol=1e-14)
    np.testing.assert_allclose(dot(a, b), np.sum(np.asarray(a) * np.asarray(b), axis=1), atol=1e-14)
    assert float(jnp.abs(dot(cross(a, b), a)).max()) < 1e-12


def test_normalize_guard():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    out = normalize(v, eps=1e-12)
    np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0], atol=1e-14)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0], atol=1e-14)


# ---------------------------------------------------------------- containers
def test_pytree_dataclass_roundtrip():
    @pytree_dataclass
    class Foo:
        a: jax.Array
        name: str = static_field(default="x")

    foo = Foo(a=jnp.arange(3.0), name="hi")
    leaves, treedef = jax.tree_util.tree_flatten(foo)
    assert len(leaves) == 1
    foo2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert foo2.name == "hi"
    np.testing.assert_array_equal(foo2.a, foo.a)

    # static fields are jit-static; array fields trace
    @jax.jit
    def f(x: Foo):
        assert isinstance(x.name, str)
        return x.replace(a=x.a * 2)

    out = f(foo)
    np.testing.assert_array_equal(out.a, [0.0, 2.0, 4.0])


# ---------------------------------------------------------------- config
def test_config_from_dict_validation():
    @dataclasses.dataclass
    class Inner:
        k: float = 1.0

    @dataclasses.dataclass
    class Cfg:
        n: int
        dt: float = 1e-3
        inner: Inner = dataclasses.field(default_factory=Inner)

        def __validate__(self):
            assert self.n > 0, "n must be positive"

    cfg = config_from_dict(Cfg, {"n": 10, "dt": 1, "inner": {"k": 2}})
    assert cfg.n == 10 and cfg.dt == 1.0 and cfg.inner.k == 2.0

    with pytest.raises(ConfigError, match="unknown keys"):
        config_from_dict(Cfg, {"n": 1, "bogus": 2})
    with pytest.raises(ConfigError, match="missing required"):
        config_from_dict(Cfg, {})
    with pytest.raises(ConfigError, match="n must be positive"):
        config_from_dict(Cfg, {"n": -1})


def test_require():
    require(True, "fine")
    with pytest.raises(Exception, match="boom"):
        require(False, "boom")


def test_zero_tolerance_table():
    """Per-dtype zero tolerances (ref Tolerance.hpp get_zero_tolerance)."""
    import jax.numpy as jnp

    from mundy_tpu.math import get_relative_tolerance, get_zero_tolerance

    assert get_zero_tolerance(np.float64) < get_zero_tolerance(np.float32)
    assert get_zero_tolerance(np.float32) < get_zero_tolerance(jnp.bfloat16)
    assert get_zero_tolerance(np.int32) == 0.0
    assert get_relative_tolerance(np.float32) > np.finfo(np.float32).eps
    with pytest.raises(TypeError):
        get_zero_tolerance(np.complex64)


def test_transform_primitive_round_trip(rng):
    """transform then inverse_transform returns every primitive field."""
    import jax
    import jax.numpy as jnp

    from mundy_tpu.geom import (
        inverse_transform_primitive,
        random_ellipsoids,
        random_rings,
        random_segments,
        random_spheres,
        random_spherocylinders,
        random_unit_quaternions,
        transform_primitive,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = random_unit_quaternions(ks[0], 1, dtype=jnp.float64)[0]
    t = jnp.asarray([0.3, -1.2, 2.0], jnp.float64)
    prims = [
        random_spheres(ks[1], 5, [0] * 3, [4] * 3, (0.2, 0.7), jnp.float64),
        random_spherocylinders(ks[2], 5, [0] * 3, [4] * 3,
                               dtype=jnp.float64),
        random_segments(ks[3], 5, [0] * 3, [4] * 3, (0.5, 2.0), jnp.float64),
        random_ellipsoids(ks[4], 5, [0] * 3, [4] * 3, dtype=jnp.float64),
        random_rings(ks[5], 5, [0] * 3, [4] * 3, dtype=jnp.float64),
    ]
    for p in prims:
        p2 = inverse_transform_primitive(q, t, transform_primitive(q, t, p))
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
            err = float(jnp.abs(a - b).max())
            # orientations: q and -q are one rotation
            if a.ndim == 2 and a.shape[-1] == 4:
                err = min(err, float(jnp.abs(a + b).max()))
            assert err < 1e-12, (type(p).__name__, err)


def test_transform_rigid_preserves_shape(rng):
    """Distances between transformed segment endpoints are invariant."""
    import jax
    import jax.numpy as jnp

    from mundy_tpu.geom import (
        random_segments,
        random_unit_quaternions,
        transform_primitive,
    )

    key = jax.random.PRNGKey(3)
    seg = random_segments(key, 8, [0] * 3, [5] * 3, (0.5, 2.0), jnp.float64)
    q = random_unit_quaternions(jax.random.PRNGKey(4), 1, jnp.float64)[0]
    t = jnp.asarray([1.0, 2.0, 3.0], jnp.float64)
    s2 = transform_primitive(q, t, seg)
    l1 = jnp.linalg.norm(seg.end - seg.start, axis=-1)
    l2 = jnp.linalg.norm(s2.end - s2.start, axis=-1)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-12)
