"""Anchor-free (FCOS-style) label helpers.

Reference: `src/anchor_free/anchor_free_helper.py`.  Vectorized, jittable:
labels are derived directly from the binary target mask without materializing
a variable-length segment list.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def get_loc_label(target) -> Array:
    """Per-position (dist-to-left, dist-to-right) within each GT segment.

    Mirrors anchor_free_helper.py:6-17,41-55: positions outside any segment
    get (0, 0).  Jittable; works on padded masks (padding must be 0).
    """
    m = jnp.asarray(target).astype(jnp.int32)

    # distance to segment start: running count of consecutive ones ending here
    def left_scan(carry, x):
        run = jnp.where(x > 0, carry + 1, 0)
        return run, run

    _, run_l = jax.lax.scan(left_scan, jnp.int32(0), m)
    _, run_r = jax.lax.scan(left_scan, jnp.int32(0), jnp.flip(m))
    run_r = jnp.flip(run_r)

    inside = m > 0
    off_l = (run_l - 1).astype(jnp.float32)
    off_r = (run_r - 1).astype(jnp.float32)
    offsets = jnp.stack([jnp.where(inside, off_l, 0.0),
                         jnp.where(inside, off_r, 0.0)], axis=-1)
    return offsets


def get_ctr_label(target, offset, eps: float = 1e-8) -> Array:
    """FCOS-style centerness label. (anchor_free_helper.py:20-38)"""
    target = jnp.asarray(target).astype(bool)
    offset = jnp.asarray(offset, jnp.float32)
    ol, orr = offset[..., 0], offset[..., 1]
    ctr = jnp.minimum(ol, orr) / (jnp.maximum(ol, orr) + eps)
    return jnp.where(target, ctr, 0.0)


def offset2bbox(offsets) -> Array:
    """LR offsets -> LR boxes: (i - l, i + r + 1). (anchor_free_helper.py:58-70)"""
    offsets = jnp.asarray(offsets, jnp.float32)
    n = offsets.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    left = idx - offsets[:, 0]
    right = idx + offsets[:, 1] + 1
    return jnp.stack([left, right], axis=-1)


# ------------------------------------------------------------------------
# numpy twins for the HOST label-prep path (see ops/anchors.py rationale)

def get_loc_label_np(target):
    import numpy as np
    m = np.asarray(target).astype(np.int32)
    n = m.shape[0]
    idx = np.arange(n)
    last_zero = np.maximum.accumulate(np.where(m == 0, idx, -1))
    run_l = idx - last_zero                       # ones ending here
    rm = m[::-1]
    last_zero_r = np.maximum.accumulate(np.where(rm == 0, idx, -1))
    run_r = (idx - last_zero_r)[::-1]
    inside = m > 0
    off_l = (run_l - 1).astype(np.float32)
    off_r = (run_r - 1).astype(np.float32)
    return np.stack([np.where(inside, off_l, 0.0),
                     np.where(inside, off_r, 0.0)], axis=-1)


def get_ctr_label_np(target, offset, eps: float = 1e-8):
    import numpy as np
    target = np.asarray(target).astype(bool)
    offset = np.asarray(offset, np.float32)
    ol, orr = offset[..., 0], offset[..., 1]
    ctr = np.minimum(ol, orr) / (np.maximum(ol, orr) + eps)
    return np.where(target, ctr, 0.0).astype(np.float32)
