"""Training-state checkpoint / resume for fitting runs.

The reference only persists scenes (`.vox`); optimization state checkpointing
is new (SURVEY.md section 5).  Checkpoints are a single ``.npz`` holding the
flattened param/optimizer pytrees plus the treedefs and step counter —
dependency-free and portable.  Scene geometry itself round-trips through the
``.vox`` codec (``vrt.io.voxfile``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, params, opt_state, step: int,
                    extra: Dict | None = None) -> None:
    p_leaves, p_def = _flatten(params)
    o_leaves, o_def = _flatten(opt_state)
    arrays = {f"p{i}": np.asarray(l) for i, l in enumerate(p_leaves)}
    arrays.update({f"o{i}": np.asarray(l) for i, l in enumerate(o_leaves)})
    meta = dict(step=int(step), n_params=len(p_leaves),
                n_opt=len(o_leaves), extra=extra or {})
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8).copy()
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, step, extra); the *_like trees provide
    structure."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    p_leaves, p_def = _flatten(params_like)
    o_leaves, o_def = _flatten(opt_state_like)
    assert meta["n_params"] == len(p_leaves), "param structure mismatch"
    assert meta["n_opt"] == len(o_leaves), "optimizer structure mismatch"
    new_p = [data[f"p{i}"] for i in range(meta["n_params"])]
    new_o = [data[f"o{i}"] for i in range(meta["n_opt"])]
    params = jax.tree.unflatten(p_def, new_p)
    opt_state = jax.tree.unflatten(o_def, new_o)
    return params, opt_state, meta["step"], meta["extra"]
