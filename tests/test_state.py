"""World/EntitySet/LinkSet, selectors, field BLAS.

Mirrors reference mesh unit tests (UnitTestMeshBuilder, UnitTestAggregate,
UnitTestStringToSelector, UnitTestLinkData, UnitTestFieldBLAS — SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mundy_tpu.core.errors import MundyError
from mundy_tpu.state import (
    WorldBuilder,
    field_amax,
    field_axpby,
    field_dot,
    field_fill,
    field_nrm2,
    links_to_csr,
    select,
)


def build_world():
    wb = WorldBuilder(dtype=jnp.float64)
    wb.declare_set("spheres", capacity=16)
    wb.declare_field("spheres", "center", (3,))
    wb.declare_field("spheres", "radius", (), fill=1.0)
    wb.declare_part("spheres", "hp1")
    wb.declare_part("spheres", "backbone")
    wb.declare_set("nodes", capacity=8)
    wb.declare_field("nodes", "coord", (3,))
    wb.declare_links("springs", ("nodes", "nodes"), capacity=8,
                     fields={"rest_length": ((), None, 1.0)})
    a = wb.add_entities("spheres", 4, parts=("hp1",), center=np.eye(4, 3), radius=0.5)
    b = wb.add_entities("spheres", 3, parts=("backbone",), radius=0.25)
    nodes = wb.add_entities("nodes", 5, coord=np.zeros((5, 3)))
    wb.add_links("springs", [[0, 1], [1, 2], [2, 3]], rest_length=2.0)
    return wb.commit(), a, b, nodes


def test_builder_and_commit():
    world, a, b, _ = build_world()
    es = world.entity("spheres")
    assert es.capacity == 16
    assert int(es.num_active) == 7
    np.testing.assert_array_equal(np.asarray(a), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(b), [4, 5, 6])
    np.testing.assert_allclose(es.field("radius")[:7],
                               [0.5] * 4 + [0.25] * 3)
    # pytree round trip through jit
    out = jax.jit(lambda w: w.entity("spheres").field("radius") * 2)(world)
    np.testing.assert_allclose(out[:4], 1.0)


def test_selectors():
    world, _, _, _ = build_world()
    es = world.entity("spheres")
    np.testing.assert_array_equal(
        np.asarray(select(es, "hp1"))[:8], [1, 1, 1, 1, 0, 0, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(select(es, "hp1 | backbone"))[:8], [1] * 7 + [0]
    )
    np.testing.assert_array_equal(
        np.asarray(select(es, "!hp1 & backbone"))[:8], [0, 0, 0, 0, 1, 1, 1, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(select(es, "(hp1 | backbone) & !backbone"))[:8],
        [1, 1, 1, 1, 0, 0, 0, 0],
    )
    # inactive slots never selected
    assert not np.asarray(select(es, "!hp1"))[8:].any()


def test_selector_errors():
    world, _, _, _ = build_world()
    es = world.entity("spheres")
    with pytest.raises(MundyError, match="unknown part"):
        select(es, "bogus")
    with pytest.raises(MundyError):
        select(es, "hp1 &")
    with pytest.raises(MundyError):
        select(es, "(hp1")


def test_links_and_csr():
    world, _, _, _ = build_world()
    ls = world.link("springs")
    assert ls.arity == 2
    assert int(jnp.sum(ls.active)) == 3
    offsets, order = links_to_csr(ls, slot=0, num_entities=8)
    # node 0 sources link 0; node 1 link 1; node 2 link 2
    offs = np.asarray(offsets)
    assert offs[1] - offs[0] == 1  # node 0 has one outgoing spring
    assert offs[3] - offs[2] == 1
    assert offs[5] - offs[4] == 0  # node 4: none
    link_ids = np.asarray(order)
    assert int(link_ids[offs[0]]) == 0


def test_field_blas_masked():
    x = jnp.asarray([1.0, 2.0, 3.0, 99.0])
    mask = jnp.asarray([True, True, True, False])
    assert float(field_dot(x, x, mask)) == 14.0
    assert float(field_nrm2(x, mask)) == np.sqrt(14.0)
    assert float(field_amax(x, mask)) == 3.0
    filled = field_fill(x, 7.0, mask)
    np.testing.assert_allclose(filled, [7, 7, 7, 99])
    y = field_axpby(2.0, x, 1.0, jnp.ones(4), mask)
    np.testing.assert_allclose(y, [3, 5, 7, 1])


def test_capacity_guard():
    wb = WorldBuilder()
    wb.declare_set("s", capacity=2)
    wb.declare_field("s", "x", ())
    wb.add_entities("s", 2)
    with pytest.raises(MundyError, match="capacity"):
        wb.add_entities("s", 1)
