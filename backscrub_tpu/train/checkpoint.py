"""Training checkpoint/resume.

The reference has no checkpointing at all (SURVEY.md §5: "none; stateless
streaming").  Training on meshes needs it: save/restore the params pytree
and optimizer state, host-side as compressed npz (flat string keys via
tree paths), device placement restored by the Trainer's shardings.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(tree, flat: Dict[str, np.ndarray]):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, old_leaf in paths_leaves:
        key = "/".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(old_leaf, "shape") and tuple(arr.shape) != tuple(old_leaf.shape):
            raise ValueError(f"{key}: shape {arr.shape} != expected {old_leaf.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0) -> None:
    """Write params (+ optional optimizer state) to ``path`` (.npz)."""
    payload = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        payload.update({f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    payload["meta/step"] = np.asarray(step)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, params_like, opt_state_like=None
                    ) -> Tuple[Any, Optional[Any], int]:
    """Restore (params, opt_state, step); templates give structure/shapes."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten_like(
        params_like, {k[len("params/"):]: v for k, v in flat.items()
                      if k.startswith("params/")})
    opt_state = None
    if opt_state_like is not None:
        opt_flat = {k[len("opt/"):]: v for k, v in flat.items()
                    if k.startswith("opt/")}
        if opt_flat:
            opt_state = _unflatten_like(opt_state_like, opt_flat)
    step = int(flat.get("meta/step", np.asarray(0)))
    return params, opt_state, step
