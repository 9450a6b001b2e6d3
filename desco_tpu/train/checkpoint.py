"""Pytree checkpointing.

Replaces Lightning's ModelCheckpoint + save_hyperparameters
(reference main.py:199-204, lightning_model.py:112-116): params and
optimizer state are saved as a flat npz keyed by pytree paths, alongside a
JSON config blob so a checkpoint fully rebuilds the model (the reference's
``on_load_checkpoint`` re-applies the hetero conversion from saved flags —
here the config IS the model structure, so rehydration is direct).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params, config: Optional[dict] = None,
                    opt_state=None, extra: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".params.npz", **_flatten(params))
    if opt_state is not None:
        np.savez(path + ".opt.npz", **_flatten(opt_state))
    meta = {"config": config or {}, "extra": extra or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, params_template,
                    opt_state_template=None) -> Tuple[Any, Any, dict]:
    """Restore arrays into pytrees shaped like the given templates."""
    def restore(template, npz):
        flat = dict(npz)
        paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path, leaf in paths:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
            arr = flat[key]
            assert arr.shape == np.shape(leaf), (key, arr.shape,
                                                 np.shape(leaf))
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = restore(params_template, np.load(path + ".params.npz"))
    opt_state = None
    if opt_state_template is not None and os.path.exists(path + ".opt.npz"):
        opt_state = restore(opt_state_template, np.load(path + ".opt.npz"))
    with open(path + ".json") as f:
        meta = json.load(f)
    return params, opt_state, meta
