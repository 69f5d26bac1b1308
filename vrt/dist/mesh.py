"""Device mesh construction + multi-host initialization.

The mesh is the TPU framework's communication topology: the 'data' axis
carries ray/tile data parallelism (and gradient all-reduce), the 'model'
axis carries volume slab sharding (``vrt.dist.brick``).  Collectives over
these axes lower to ICI within a slice and DCN across hosts — no custom
transport (SURVEY.md §2.11/§5).
"""

from __future__ import annotations

import numpy as np

import jax

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_render_mesh(n_data: int, n_model: int = 1,
                     devices=None) -> "jax.sharding.Mesh":
    """An (n_data, n_model) mesh with axes ('data', 'model').

    ``devices`` defaults to the first n_data*n_model of ``jax.devices()``;
    device order is preserved so the 'model' axis maps to mesh-adjacent
    devices (slab halos ride the fastest links).
    """
    need = n_data * n_model
    if devices is None:
        devices = jax.devices()
    devices = list(devices)[:need]
    if len(devices) < need:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {need} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices, dtype=object).reshape(n_data, n_model)
    return jax.sharding.Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with the standard
    env-var autodetection when arguments are omitted.  Idempotent."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        # already initialized (or single-process context): both are fine
        pass


def local_mesh_shape(n_model: int = 1) -> tuple[int, int]:
    """(n_data, n_model) using every visible device."""
    n = len(jax.devices())
    assert n % n_model == 0, (n, n_model)
    return n // n_model, n_model
