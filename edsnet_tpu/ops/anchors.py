"""Anchor machinery for the anchor-based head.

Reference: `src/anchor_based/anchor_helper.py`.  All functions are pure jnp
and jittable; label generation is vectorized over (targets x anchors) instead
of the reference's per-target python loop — with the reference's
"later target overwrites earlier" loc-label semantics preserved
(anchor_helper.py:40-45).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.ops.bbox import iou_cw

Array = jax.Array


def get_anchors(seq_len: int, scales: Sequence[int]) -> Array:
    """[N, S, 2] center-width anchors: (pos, scale). (anchor_helper.py:8-19)"""
    pos = jnp.arange(seq_len, dtype=jnp.int32)
    sc = jnp.asarray(list(scales), dtype=jnp.int32)
    centers = jnp.broadcast_to(pos[:, None], (seq_len, len(sc)))
    widths = jnp.broadcast_to(sc[None, :], (seq_len, len(sc)))
    return jnp.stack([centers, widths], axis=-1)


def bbox2offset(bboxes, anchors) -> Array:
    """CW boxes -> offset labels. (anchor_helper.py:96-112)"""
    bboxes = jnp.asarray(bboxes, jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    oc = (bboxes[..., 0] - anchors[..., 0]) / anchors[..., 1]
    ow = jnp.log(bboxes[..., 1] / anchors[..., 1])
    return jnp.stack([oc, ow], axis=-1)


def offset2bbox(offsets, anchors) -> Array:
    """Predicted offsets -> CW boxes. (anchor_helper.py:74-93)"""
    offsets = jnp.asarray(offsets, jnp.float32).reshape(-1, 2)
    anchors = jnp.asarray(anchors, jnp.float32).reshape(-1, 2)
    bc = offsets[:, 0] * anchors[:, 1] + anchors[:, 0]
    bw = jnp.exp(offsets[:, 1]) * anchors[:, 1]
    return jnp.stack([bc, bw], axis=-1)


def get_pos_label(anchors, targets, iou_thresh: float,
                  target_valid=None) -> Tuple[Array, Array]:
    """Positive cls/loc labels. (anchor_helper.py:22-50)

    :param anchors: [N, S, 2] CW anchors.
    :param targets: [T, 2] CW target boxes (padded rows allowed with
        ``target_valid`` mask).
    :param iou_thresh: positive threshold (strictly greater).
    :return: (cls_label [N, S] int32 0/1, loc_label [N, S, 2] float32).
        For anchors positive to several targets, loc is the offset to the
        *last* matching target (reference loop-order semantics).
    """
    anchors = jnp.asarray(anchors, jnp.float32)
    n, s, _ = anchors.shape
    flat_anchors = anchors.reshape(n * s, 2)
    targets = jnp.asarray(targets, jnp.float32).reshape(-1, 2)
    t = targets.shape[0]

    iou = iou_cw(flat_anchors[None, :, :], targets[:, None, :])  # [T, A]
    pos = iou > iou_thresh
    if target_valid is not None:
        pos = pos & jnp.asarray(target_valid, bool)[:, None]

    cls_label = jnp.any(pos, axis=0).astype(jnp.int32)

    # index of the last target matching each anchor
    t_idx = jnp.arange(t)[:, None]
    last_t = jnp.max(jnp.where(pos, t_idx, -1), axis=0)  # [A]
    chosen = targets[jnp.clip(last_t, 0, max(t - 1, 0))]
    offsets = bbox2offset(chosen, flat_anchors)
    loc_label = jnp.where((last_t >= 0)[:, None], offsets, 0.0)

    return cls_label.reshape(n, s), loc_label.reshape(n, s, 2)


def get_neg_label(cls_label, num_neg, rng: jax.Array) -> Array:
    """Random negative sampling, jittable. (anchor_helper.py:53-71)

    Marks ``num_neg`` random anchors among the non-positive ones with -1.
    ``num_neg`` may be a traced scalar (it is 2x the positive count in the
    trainer), implemented as rank-of-random selection.
    """
    cls_label = jnp.asarray(cls_label, jnp.int32)
    shape = cls_label.shape
    flat = cls_label.reshape(-1)
    flat = jnp.where(flat < 0, 0, flat)
    eligible = flat == 0
    u = jax.random.uniform(rng, flat.shape)
    u = jnp.where(eligible, u, jnp.inf)
    order = jnp.argsort(u)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    chosen = eligible & (rank < num_neg)
    out = jnp.where(chosen, -1, flat)
    return out.reshape(shape)


def anchor_scales_list(anchor_scales) -> List[int]:
    if isinstance(anchor_scales, int):
        return [anchor_scales]
    return list(anchor_scales)


# ---------------------------------------------------------------------------
# numpy twins for the HOST label-prep path
# ---------------------------------------------------------------------------
# prepare_items runs once per dataset on the host; routing it through jnp
# meant one accelerator-platform compile per unique (video, target) shape —
# ~20s each on the remote-compile tunnel, minutes of startup for a 50-video
# dataset.  These numpy twins are semantically identical (equality pinned by
# tests/ops/test_anchors.py) and compile nothing.

def _iou_cw_np(a: "np.ndarray", t: "np.ndarray") -> "np.ndarray":
    a_l, a_r = a[..., 0] - a[..., 1] * 0.5, a[..., 0] + a[..., 1] * 0.5
    t_l, t_r = t[..., 0] - t[..., 1] * 0.5, t[..., 0] + t[..., 1] * 0.5
    inter = np.maximum(np.minimum(a_r, t_r) - np.maximum(a_l, t_l), 0.0)
    union = np.maximum(a_r, t_r) - np.minimum(a_l, t_l)
    union = np.where(union <= 0.0, 1e-6, union)
    return inter / union


def get_anchors_np(seq_len: int, scales: Sequence[int]) -> "np.ndarray":
    pos = np.arange(seq_len, dtype=np.int32)
    sc = np.asarray(list(scales), dtype=np.int32)
    centers = np.broadcast_to(pos[:, None], (seq_len, len(sc)))
    widths = np.broadcast_to(sc[None, :], (seq_len, len(sc)))
    return np.stack([centers, widths], axis=-1)


def get_pos_label_np(anchors, targets, iou_thresh: float,
                     target_valid=None):
    """Numpy twin of get_pos_label (same reference loop-order semantics)."""
    anchors = np.asarray(anchors, np.float32)
    n, s, _ = anchors.shape
    flat = anchors.reshape(n * s, 2)
    targets = np.asarray(targets, np.float32).reshape(-1, 2)
    t = targets.shape[0]

    iou = _iou_cw_np(flat[None, :, :], targets[:, None, :])  # [T, A]
    pos = iou > iou_thresh
    if target_valid is not None:
        pos = pos & np.asarray(target_valid, bool)[:, None]

    cls_label = np.any(pos, axis=0).astype(np.int32)
    t_idx = np.arange(t)[:, None]
    last_t = np.max(np.where(pos, t_idx, -1), axis=0) if t else \
        np.full(n * s, -1)
    chosen = targets[np.clip(last_t, 0, max(t - 1, 0))] if t else \
        np.zeros((n * s, 2), np.float32)
    oc = (chosen[:, 0] - flat[:, 0]) / flat[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        ow = np.log(chosen[:, 1] / flat[:, 1])
    offsets = np.stack([oc, ow], axis=-1).astype(np.float32)
    loc_label = np.where((last_t >= 0)[:, None], offsets, 0.0)
    return cls_label.reshape(n, s), \
        loc_label.reshape(n, s, 2).astype(np.float32)
