"""Megatron-style tensor parallelism for the MHA backbone.

The attention backbone is where the flagship model's matmul FLOPs live
(``AttentionExtractor``, models/attention.py): per layer, three [F, F]
input projections, the per-head score/value contractions, and an [F, F]
output projection.  Head sharding splits all four over a ``('model',)``
mesh axis the classic way (Shoeybi et al., arXiv:1909.08053):

- ``Q``/``K``/``V`` kernels are COLUMN-sharded ``P(None, 'model')`` — the
  reshape to [B, N, H, d_k] is head-major, so each device holds H/P whole
  heads and the softmax + value contraction stay entirely local;
- the output ``fc`` kernel is ROW-sharded ``P('model', None)`` — each
  device contributes a partial [B, N, F] product and XLA inserts the one
  all-reduce per layer that completes it.

No model code changes: the shardings ride ``jax.device_put`` on the param
pytree and GSPMD propagation does the rest.  The torch reference has no
TP story at all (strictly single-GPU, src/train.py); on TPU this is how
the backbone widens past one chip's MXU without touching the data axis.

Attention modules are detected STRUCTURALLY — any param subtree holding
all of ``{Q, K, V, fc}`` is one (the head's separate ``fc`` trunks never
co-occur with Q/K/V siblings), so the helper works for every base model
that embeds ``AttentionExtractor`` (attention / deep / multi-head
encoders) and leaves everything else replicated.
"""
from __future__ import annotations

from collections.abc import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edsnet_tpu.parallel.mesh import make_mesh

_ATTN_KEYS = ("Q", "K", "V", "fc")


def make_model_mesh(num_devices: int = 0) -> Mesh:
    """1-D ``('model',)`` mesh over the first ``num_devices`` devices."""
    return make_mesh(num_devices, axis="model")


def make_dp_tp_mesh(dp: int, tp: int) -> Mesh:
    """2-D ``('data', 'model')`` mesh: batch-of-videos axis over ``dp``
    devices x attention heads over ``tp``.  ``shard_batch``'s
    ``P('data')`` and ``tp_shardings``'s ``P(..., 'model')`` specs both
    leave the other axis unmentioned (= replicated over it), so the
    data-parallel batch layout and the head-sharded params compose on
    this mesh without touching the jitted train step — XLA inserts the
    gradient psum over ``data`` and the fc all-reduce over ``model``.
    On a real pod, lay ``model`` on the minor (fastest-ICI) mesh axis."""
    devices = jax.devices()
    if len(devices) < dp * tp:
        raise ValueError(f"need {dp}x{tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:dp * tp]).reshape(dp, tp),
                ("data", "model"))


def tp_shardings(variables, mesh: Mesh, num_heads: int):
    """NamedSharding pytree matching ``variables``: attention projections
    head-sharded over the mesh's ``model`` axis, everything else
    replicated.  ``num_heads`` must divide the mesh size so every device
    owns whole heads (a split head would force an extra all-reduce inside
    the score contraction)."""
    p = mesh.shape["model"]
    if num_heads % p != 0:
        raise ValueError(
            f"num_heads={num_heads} must be a multiple of the model-mesh "
            f"size {p} so each device holds whole heads")
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, "model"))
    row = NamedSharding(mesh, P("model", None))

    def walk(tree):
        if not isinstance(tree, Mapping):
            return rep
        is_attn = all(k in tree for k in _ATTN_KEYS)
        out = {}
        for name, sub in tree.items():
            if is_attn and name in _ATTN_KEYS:
                # only the [F, F] kernel carries the head sharding; bias/
                # scale leaves are rank-1 (the matrix specs would be a
                # rank mismatch) and a row-sharded fc bias would be
                # summed once per shard by the layer's all-reduce
                spec = row if name == "fc" else col
                out[name] = {k: (spec if k == "kernel"
                                 else jax.tree.map(lambda _: rep, v))
                             for k, v in sub.items()}
            else:
                out[name] = walk(sub)
        return out

    return walk(variables)


def shard_params_tp(variables, mesh: Mesh, num_heads: int):
    """Place ``variables`` on the mesh with head-sharded attention."""
    return jax.device_put(variables, tp_shardings(variables, mesh,
                                                  num_heads))
