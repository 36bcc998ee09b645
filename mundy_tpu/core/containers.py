"""Pytree dataclass containers.

Replaces the reference's compile-time tagged aggregates
(`mundy/core/src/mundy_core/aggregate.hpp:88-603`) and Kokkos-compatible
`tuple`/`variant` (`tuple.hpp`, `variant.hpp`): in JAX the idiomatic
equivalent is a frozen dataclass registered as a pytree, whose array leaves
flow through `jit`/`vmap`/`shard_map` and whose static fields become part of
the treedef (trace-time constants).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> dataclasses.Field:
    """Mark a dataclass field as static (part of the pytree treedef).

    Static fields participate in jit-cache keys; use for python scalars that
    select code paths (counts, flags, enum strings), never for arrays.
    """
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["mundy_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with `static_field()` go into the treedef (auxiliary
    data); all other fields are children (array leaves / sub-pytrees).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)

    data_names = []
    static_names = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("mundy_static", False):
            static_names.append(f.name)
        else:
            data_names.append(f.name)

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in data_names)
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
        )
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(data_names, children))
        kwargs.update(dict(zip(static_names, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self: _T, **changes: Any) -> _T:
        return dataclasses.replace(self, **changes)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
