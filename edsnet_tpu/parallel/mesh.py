"""Device mesh + sharding helpers for data-parallel training.

The reference is strictly single-process single-device (SURVEY.md §2.2);
the TPU build scales by sharding the batch-of-videos axis over a 1-D
``('data',)`` mesh.  Parameters are replicated (the models are ~1-5M
params); XLA inserts the gradient ``psum`` over ICI automatically from the
sharding annotations.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0) -> Mesh:
    devices = jax.devices()
    n = num_devices if num_devices > 0 else len(devices)
    return Mesh(np.asarray(devices[:n]), ("data",))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Put batch arrays on the mesh, sharded along the leading (video) axis."""
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
