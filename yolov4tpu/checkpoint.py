"""Checkpoint save/resume.

The reference's persistence story: keras SavedModel/h5 of the raw conv model
(reference models.py:86-93) with a dead .h5-restore branch (models.py:75-81)
and epoch bookkeeping left to ``fit(initial_epoch=...)``.  Here:

  - ``save_npz``/``load_npz``: single-file, dependency-free pytree
    checkpoints (params + BN state + optional opt state + step counter);
  - ``save_orbax``/``load_orbax``: orbax-backed directory checkpoints for
    large-scale async use;
  - darknet ``.weights`` import/export lives in weights.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        flat[prefix + "__none__"] = np.zeros(0)
    else:
        flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    # Rebuild nested dict/list structure from slash-separated keys.
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def resolve(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"__none__"}:
                return None
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [resolve(node[str(i)]) for i in range(len(keys))]
            return {k: resolve(v) for k, v in node.items()}
        return node

    return resolve(root)


def save_npz(path: str, params, state, step: int = 0, extra: Optional[dict] = None):
    """Save (params, state[, metadata]) to one .npz file."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(params).items()})
    flat.update({f"state/{k}": v for k, v in _flatten(state).items()})
    flat["meta/step"] = np.asarray(step)
    if extra:
        flat["meta/extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[dict, dict, int, dict]:
    """Load a .npz checkpoint -> (params, state, step, extra)."""
    data = np.load(path, allow_pickle=False)
    params_flat, state_flat = {}, {}
    step, extra = 0, {}
    for k in data.files:
        if k.startswith("params/"):
            params_flat[k[len("params/"):]] = data[k]
        elif k.startswith("state/"):
            state_flat[k[len("state/"):]] = data[k]
        elif k == "meta/step":
            step = int(data[k])
        elif k == "meta/extra_json":
            extra = json.loads(bytes(data[k].tobytes()).decode())
    return _unflatten(params_flat), _unflatten(state_flat), step, extra


def save_orbax(directory: str, params, state, step: int = 0):
    """Orbax directory checkpoint (async-capable, multi-host-safe)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"),
               {"params": params, "state": state}, force=True)
    ckptr.wait_until_finished()


def load_orbax(directory: str, step: int):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(directory), f"step_{step}"))
    return restored["params"], restored["state"]


def latest_orbax_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None
