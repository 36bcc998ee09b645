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


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a checkpoint into the structure of `template` (dtypes/shapes
    validated leaf by leaf)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        keys = sorted(data.files, key=lambda k: int(k.split("|")[0]))
        if len(keys) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, template has {len(leaves)}"
            )
        loaded = []
        for k, ref in zip(keys, leaves):
            arr = data[k]
            ref_arr = np.asarray(ref)
            if arr.shape != ref_arr.shape:
                raise ValueError(
                    f"leaf {k}: shape {arr.shape} != template {ref_arr.shape}"
                )
            loaded.append(jax.numpy.asarray(arr.astype(ref_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, loaded)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent ckpt path, or None (the enable_continuation path)."""
    cands = glob.glob(os.path.join(directory, "ckpt_*.npz"))
    if not cands:
        return None

    def step_of(p):
        m = re.search(r"ckpt_(\d+)\.npz$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=step_of)
