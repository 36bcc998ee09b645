"""World: sharded structure-of-arrays entity state.

Replaces STK BulkData/MetaData + Mundy's extensions (`MeshBuilder.hpp:50`,
`MetaData.hpp:48`, `BulkData.hpp:63`, `DeclareEntities.hpp:54`,
`LinkData.hpp:183`, `LinkCRSData.hpp`). Entities live in named `EntitySet`s
(one per rank/type), each a dict of capacity-sized arrays plus an active
mask; "parts" are boolean masks; N-ary links are index arrays with their own
occupancy masks (the capacity-bounded analog of `request_link/
process_requests` dynamic topology).

Everything in `World` is a pytree: it jits, vmaps, shards, and checkpoints
as one value.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mundy_tpu.core.containers import pytree_dataclass, static_field
from mundy_tpu.core.errors import require


@pytree_dataclass
class EntitySet:
    """A rank of entities: fields (cap, ...), parts as masks, occupancy."""

    fields: dict  # name -> (capacity, ...) array
    parts: dict  # name -> (capacity,) bool mask
    active: Array  # (capacity,) bool
    capacity: int = static_field(default=0)

    @property
    def num_active(self) -> Array:
        return jnp.sum(self.active)

    def field(self, name: str) -> Array:
        return self.fields[name]

    def set_field(self, name: str, value: Array) -> "EntitySet":
        require(name in self.fields, f"unknown field '{name}'")
        new = dict(self.fields)
        new[name] = value
        return self.replace(fields=new)


@pytree_dataclass
class LinkSet:
    """N-ary connectivity (COO): indices[c, k] = entity index in target set k.

    The static `targets` tuple names the linked EntitySets per slot — the
    analog of LinkMetaData's linked-entity ranks (`LinkMetaData.hpp`).
    Capacity-bounded with an active mask: link "creation"/"destruction"
    (`LinkData.hpp:159-183`) become mask flips + slot writes.
    """

    indices: Array  # (capacity, arity) int32
    active: Array  # (capacity,) bool
    fields: dict  # per-link fields, name -> (capacity, ...) array
    targets: tuple = static_field(default=())

    @property
    def capacity(self) -> int:
        return self.indices.shape[0]

    @property
    def arity(self) -> int:
        return self.indices.shape[1]


@pytree_dataclass
class World:
    sets: dict  # name -> EntitySet
    links: dict  # name -> LinkSet

    def entity(self, name: str) -> EntitySet:
        return self.sets[name]

    def link(self, name: str) -> LinkSet:
        return self.links[name]

    def update_set(self, name: str, es: EntitySet) -> "World":
        new = dict(self.sets)
        new[name] = es
        return self.replace(sets=new)

    def update_link(self, name: str, ls: LinkSet) -> "World":
        new = dict(self.links)
        new[name] = ls
        return self.replace(links=new)


class WorldBuilder:
    """Host-side declaration -> committed World.

    Mirrors the fluent declaration flow of the reference
    (MeshBuilder -> MetaData declare parts/fields -> DeclareEntitiesHelper ->
    commit): declare entity sets with fields/parts and capacities, add
    entities with initial values, then `commit()` produces the device-ready
    pytree. numpy staging keeps commit cheap (single host->device transfer).
    """

    def __init__(self, dtype=jnp.float32):
        self.dtype = jnp.dtype(dtype)
        self._sets: dict[str, dict] = {}
        self._links: dict[str, dict] = {}

    # ---- declaration --------------------------------------------------
    def declare_set(self, name: str, capacity: int) -> "WorldBuilder":
        require(name not in self._sets, f"entity set '{name}' already declared")
        self._sets[name] = {
            "capacity": int(capacity),
            "fields": {},  # name -> (shape_tail, dtype, fill)
            "parts": {},  # name -> np.bool_ mask
            "count": 0,
            "staged": {},  # field name -> np array buffer
        }
        return self

    def declare_field(self, set_name: str, field: str, shape_tail=(), dtype=None,
                      fill=0.0) -> "WorldBuilder":
        s = self._sets[set_name]
        require(field not in s["fields"], f"field '{field}' already declared")
        dt = self.dtype if dtype is None else jnp.dtype(dtype)
        s["fields"][field] = (tuple(shape_tail), dt, fill)
        s["staged"][field] = np.full(
            (s["capacity"],) + tuple(shape_tail), fill, dtype=dt
        )
        return self

    def declare_part(self, set_name: str, part: str) -> "WorldBuilder":
        s = self._sets[set_name]
        require(part not in s["parts"], f"part '{part}' already declared")
        s["parts"][part] = np.zeros(s["capacity"], dtype=bool)
        return self

    def declare_links(self, name: str, targets: tuple, capacity: int,
                      fields: Optional[dict] = None) -> "WorldBuilder":
        """targets: tuple of entity-set names, one per link slot."""
        require(name not in self._links, f"link set '{name}' already declared")
        for t in targets:
            require(t in self._sets, f"link target set '{t}' not declared")
        self._links[name] = {
            "targets": tuple(targets),
            "capacity": int(capacity),
            "indices": np.zeros((capacity, len(targets)), np.int32),
            "active": np.zeros(capacity, bool),
            "count": 0,
            "fields": {},
        }
        if fields:
            for fname, spec in fields.items():
                shape_tail, dt, fill = spec
                self._links[name]["fields"][fname] = np.full(
                    (capacity,) + tuple(shape_tail), fill,
                    dtype=self.dtype if dt is None else jnp.dtype(dt),
                )
        return self

    # ---- entity declaration (DeclareEntitiesHelper analog) ------------
    def add_entities(self, set_name: str, n: int, parts=(), **field_values) -> np.ndarray:
        """Append n entities; returns their indices. Field values broadcast."""
        s = self._sets[set_name]
        start, end = s["count"], s["count"] + n
        require(end <= s["capacity"], f"entity set '{set_name}' capacity exceeded")
        for fname, val in field_values.items():
            require(fname in s["fields"], f"unknown field '{fname}' in '{set_name}'")
            s["staged"][fname][start:end] = np.asarray(val)
        for p in parts:
            require(p in s["parts"], f"unknown part '{p}' in '{set_name}'")
            s["parts"][p][start:end] = True
        s["count"] = end
        return np.arange(start, end)

    def add_links(self, link_name: str, indices, **field_values) -> np.ndarray:
        ln = self._links[link_name]
        indices = np.asarray(indices, np.int32).reshape(-1, len(ln["targets"]))
        n = indices.shape[0]
        start, end = ln["count"], ln["count"] + n
        require(end <= ln["capacity"], f"link set '{link_name}' capacity exceeded")
        ln["indices"][start:end] = indices
        ln["active"][start:end] = True
        for fname, val in field_values.items():
            ln["fields"][fname][start:end] = np.asarray(val)
        ln["count"] = end
        return np.arange(start, end)

    # ---- commit --------------------------------------------------------
    def commit(self) -> World:
        sets = {}
        for name, s in self._sets.items():
            active = np.zeros(s["capacity"], bool)
            active[: s["count"]] = True
            sets[name] = EntitySet(
                fields={k: jnp.asarray(v) for k, v in s["staged"].items()},
                parts={k: jnp.asarray(v) for k, v in s["parts"].items()},
                active=jnp.asarray(active),
                capacity=s["capacity"],
            )
        links = {}
        for name, ln in self._links.items():
            links[name] = LinkSet(
                indices=jnp.asarray(ln["indices"]),
                active=jnp.asarray(ln["active"]),
                fields={k: jnp.asarray(v) for k, v in ln["fields"].items()},
                targets=ln["targets"],
            )
        return World(sets=sets, links=links)


def links_to_csr(links: LinkSet, slot: int, num_entities: int):
    """COO -> CSR mirror for per-entity traversal over link slot `slot`.

    Replaces the device COO->CSR rebuild (`LinkCRSData.hpp`,
    `impl/NgpCOOToCRSSynchronizer.hpp:70-569`): one sort + searchsorted.
    Returns (offsets (num_entities+1,), link_ids sorted by entity).
    Inactive links sort to the end and are excluded via offsets.
    """
    src = jnp.where(links.active, links.indices[:, slot], num_entities)
    order = jnp.argsort(src)
    sorted_src = src[order]
    offsets = jnp.searchsorted(sorted_src, jnp.arange(num_entities + 1))
    return offsets, order.astype(jnp.int32)
