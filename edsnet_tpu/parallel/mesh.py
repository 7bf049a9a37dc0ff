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


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (0 = all).

    Raises on a request larger than the devices present: silently
    training on fewer devices than ``--num-devices`` asked for would also
    silently change the batch-padding quantum and the RNG streams that
    depend on it.
    """
    devices = jax.devices()
    n = num_devices if num_devices > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, but only "
                         f"{len(devices)} are available")
    return Mesh(np.asarray(devices[:n]), (axis,))


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


def make_ring_mesh(cp: int, tp: int = 0, num_devices: int = 0) -> Mesh:
    """Mesh for ring attention SPANNING the training device set.

    Inside one jitted computation every mesh must cover the same device
    set: a ring shard-mapped over a 2-device sub-mesh cannot coexist with
    params committed to the full 8-device training mesh (JAX rejects the
    mixed device sets at trace time).  So the ring rides a RESHAPE of the
    full set instead: ``('data', 'seq')`` with ``seq = cp``, plus a
    trailing ``'model'`` axis when tensor parallelism is active, so one
    mesh serves dp x sp x tp simultaneously (ring_attention's
    batch_axis/head_axis route the extra axes).

    ``cp = -1`` puts every device not taken by ``tp`` on the sequence
    axis.  Raises ValueError when the factorization doesn't divide the
    device count — CLI callers surface that directly to the user.
    """
    devices = jax.devices()
    total = num_devices if num_devices > 0 else len(devices)
    if total > len(devices):
        raise ValueError(f"ring mesh over {total} devices requested, but "
                         f"only {len(devices)} are available")
    tp = max(int(tp), 1)
    seq = int(cp) if int(cp) > 0 else max(total // tp, 1)
    if seq < 2:
        raise ValueError(f"ring mesh needs >=2 sequence-axis devices, "
                         f"got cp={cp} of {total}")
    if total % (seq * tp):
        raise ValueError(
            f"--context-parallel {seq}" +
            (f" x --tensor-parallel {tp}" if tp > 1 else "") +
            f" must divide the device count {total}")
    shape = (total // (seq * tp), seq) + ((tp,) if tp > 1 else ())
    axes = ("data", "seq") + (("model",) if tp > 1 else ())
    return Mesh(np.asarray(devices[:total]).reshape(shape), axes)
