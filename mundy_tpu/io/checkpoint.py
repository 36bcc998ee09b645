"""Pytree checkpoints: save/restore any state pytree + step metadata.

Replaces the reference's Exodus restart path (`IOBroker.hpp:97-140,240-252`,
`enable_continuation_if_available` in the HP1 driver `:897-899`): the whole
simulation state is one pytree, so checkpointing is a single npz write of
its leaves keyed by tree path, and resume restores into the same structure
(the treedef carries statics, so loading requires a template state — the
analog of the mesh/field declarations existing before restart_mesh).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _leaf_key(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return "/".join(out)


def save_checkpoint(directory: str, step: int, state: Any, metadata: Optional[dict] = None) -> str:
    """Write `<dir>/ckpt_<step>.npz` (+ sidecar json). Returns the path."""
    os.makedirs(directory, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for i, (path, leaf) in enumerate(leaves):
        arrays[f"{i:04d}|{_leaf_key(path)}"] = np.asarray(leaf)
    path_npz = os.path.join(directory, f"ckpt_{step:012d}.npz")
    tmp = path_npz + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path_npz)  # atomic publish (crash-safe restart files)
    meta = {"step": int(step), "num_leaves": len(leaves)}
    if metadata:
        meta.update(metadata)
    with open(os.path.join(directory, f"ckpt_{step:012d}.json"), "w") as f:
        json.dump(meta, f)
    return path_npz


def _migrate_legacy_chromatin(by_name: dict) -> dict:
    """Checkpoint-version shim: chromatin crosslinkers moved from three
    (X,) arrays (xl_home / xl_state / xl_bound_to, -1 = unbound) onto a
    LinkSet (indices (X, 2), active (X,), fields["state"]). Pre-LinkSet
    checkpoints are mapped in place so `--continue` runs across that
    commit keep loading. Semantics (driver/apps/chromatin.py ChromatinState
    docstring): indices[:, 0] = home bead, indices[:, 1] = right-head
    target (meaningful iff active), active = doubly bound."""
    legacy = ("xl_home", "xl_state", "xl_bound_to")
    names = {k.split("/")[-1]: k for k in by_name}
    if not all(n in names for n in legacy):
        return by_name
    home = by_name[names["xl_home"]].astype(np.int32)
    state = by_name[names["xl_state"]].astype(np.int32)
    bound = by_name[names["xl_bound_to"]].astype(np.int32)
    out = {k: v for k, v in by_name.items()
           if k not in (names["xl_home"], names["xl_state"],
                        names["xl_bound_to"])}
    active = bound >= 0
    out["xl/indices"] = np.stack([home, np.where(active, bound, home)],
                                 axis=1)
    out["xl/active"] = active
    out["xl/fields/state"] = state
    return out


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a checkpoint into the structure of `template` (dtypes/shapes
    validated leaf by leaf). Leaves match by order; when the leaf count
    disagrees (a state-layout change since the checkpoint was written), a
    name-keyed match with known layout migrations is attempted before
    failing."""
    pleaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [leaf for _, leaf in pleaves]

    def _finish(arrs):
        loaded = []
        for name, arr, ref in arrs:
            ref_arr = np.asarray(ref)
            if arr.shape != ref_arr.shape:
                raise ValueError(
                    f"leaf {name}: shape {arr.shape} != template "
                    f"{ref_arr.shape}")
            loaded.append(jax.numpy.asarray(arr.astype(ref_arr.dtype)))
        return jax.tree_util.tree_unflatten(treedef, loaded)

    with np.load(path) as data:
        keys = sorted(data.files, key=lambda k: int(k.split("|")[0]))
        order_err = None
        if len(keys) == len(leaves):
            try:
                return _finish([(k, data[k], ref)
                                for k, ref in zip(keys, leaves)])
            except ValueError as e:  # layout changed at equal leaf count
                order_err = e
        # name-keyed fallback with known layout migrations
        by_name = {k.split("|", 1)[1]: data[k] for k in keys}
        by_name = _migrate_legacy_chromatin(by_name)
        tkeys = [_leaf_key(p) for p, _ in pleaves]
        if len(set(tkeys)) == len(tkeys) and all(t in by_name for t in tkeys):
            return _finish([(t, by_name[t], ref)
                            for t, ref in zip(tkeys, leaves)])
        if order_err is not None:
            raise order_err
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, template has {len(leaves)} "
            f"(state layout changed since this checkpoint was written; no "
            f"migration covers it)")


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent ckpt path, or None (the enable_continuation path)."""
    cands = glob.glob(os.path.join(directory, "ckpt_*.npz"))
    if not cands:
        return None

    def step_of(p):
        m = re.search(r"ckpt_(\d+)\.npz$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=step_of)
