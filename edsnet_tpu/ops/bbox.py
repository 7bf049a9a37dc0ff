"""1-D bounding-box algebra and NMS, TPU-first.

Semantics mirror the reference `src/helpers/bbox_helper.py` (verified against
its hand-computed unit tests in `tests/helpers/test_bbox_helper.py`), but the
implementations are pure jnp so every function can live inside a jitted
train/eval step.  Variable-length outputs (`seq2bbox`, `nms`) additionally get
fixed-shape masked variants for use under jit.

Note the reference's IoU denominator is the *convex hull* span
(`union = max(right) - min(left)`), not the true union — we reproduce that
exactly (see `bbox_helper.py:49-70`).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def lr2cw(bbox_lr) -> Array:
    """Left-right to center-width. [N, 2] -> [N, 2]. (bbox_helper.py:8-18)"""
    bbox_lr = jnp.asarray(bbox_lr, dtype=jnp.float32).reshape((-1, 2))
    center = (bbox_lr[:, 0] + bbox_lr[:, 1]) * 0.5
    width = bbox_lr[:, 1] - bbox_lr[:, 0]
    return jnp.stack([center, width], axis=-1)


def cw2lr(bbox_cw) -> Array:
    """Center-width to left-right. [N, 2] -> [N, 2]. (bbox_helper.py:21-31)"""
    bbox_cw = jnp.asarray(bbox_cw, dtype=jnp.float32).reshape((-1, 2))
    left = bbox_cw[:, 0] - bbox_cw[:, 1] * 0.5
    right = bbox_cw[:, 0] + bbox_cw[:, 1] * 0.5
    return jnp.stack([left, right], axis=-1)


def iou_lr(anchor_bbox, target_bbox) -> Array:
    """Pairwise IoU of LR boxes; hull-span denominator. (bbox_helper.py:49-70)

    Broadcasts over leading dims: [..., 2] x [..., 2] -> [...].
    """
    anchor_bbox = jnp.asarray(anchor_bbox, dtype=jnp.float32)
    target_bbox = jnp.asarray(target_bbox, dtype=jnp.float32)
    a_l, a_r = anchor_bbox[..., 0], anchor_bbox[..., 1]
    t_l, t_r = target_bbox[..., 0], target_bbox[..., 1]

    inter = jnp.minimum(a_r, t_r) - jnp.maximum(a_l, t_l)
    inter = jnp.maximum(inter, 0.0)
    union = jnp.maximum(a_r, t_r) - jnp.minimum(a_l, t_l)
    union = jnp.where(union <= 0.0, 1e-6, union)
    return inter / union


def iou_cw(anchor_bbox, target_bbox) -> Array:
    """Pairwise IoU of CW boxes. (bbox_helper.py:73-77)"""
    a = jnp.asarray(anchor_bbox, dtype=jnp.float32)
    t = jnp.asarray(target_bbox, dtype=jnp.float32)
    a_lr = jnp.stack([a[..., 0] - a[..., 1] * 0.5, a[..., 0] + a[..., 1] * 0.5], -1)
    t_lr = jnp.stack([t[..., 0] - t[..., 1] * 0.5, t[..., 0] + t[..., 1] * 0.5], -1)
    return iou_lr(a_lr, t_lr)


# ---------------------------------------------------------------------------
# binary mask -> segments
# ---------------------------------------------------------------------------

def seq2bbox(sequence) -> np.ndarray:
    """Binary mask -> LR segment boxes [K, 2] (host, variable length).

    Mirrors bbox_helper.py:34-46 (groupby over consecutive indices).
    """
    sequence = np.asarray(sequence, dtype=bool)
    if sequence.size == 0:
        return np.zeros((0, 2), dtype=np.int32)
    m = sequence.astype(np.int32)
    starts = np.where(np.diff(np.concatenate([[0], m])) == 1)[0]
    ends = np.where(np.diff(np.concatenate([m, [0]])) == -1)[0] + 1
    if starts.size == 0:
        return np.zeros((0, 2), dtype=np.int32)
    return np.stack([starts, ends], axis=-1).astype(np.int32)


@partial(jax.jit, static_argnames=("max_boxes",))
def seq2bbox_masked(mask, max_boxes: int) -> Tuple[Array, Array]:
    """Jittable binary mask -> fixed-size LR boxes.

    :param mask: [N] 0/1 sequence (may be bool/int/float).
    :param max_boxes: static upper bound on number of segments (<= ceil(N/2)).
    :return: (boxes [max_boxes, 2] int32 LR, valid [max_boxes] bool).
        Invalid rows are (0, 0).
    """
    m = jnp.asarray(mask).astype(jnp.int32)
    n = m.shape[0]
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), m[:-1]])
    nxt = jnp.concatenate([m[1:], jnp.zeros((1,), jnp.int32)])
    is_start = (m == 1) & (prev == 0)
    is_end = (m == 1) & (nxt == 0)

    idx = jnp.arange(n, dtype=jnp.int32)
    # rank of each segment = running count of starts/ends before it
    start_rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    end_rank = jnp.cumsum(is_end.astype(jnp.int32)) - 1

    starts = jnp.zeros((max_boxes,), jnp.int32)
    ends = jnp.zeros((max_boxes,), jnp.int32)
    starts = starts.at[jnp.where(is_start, start_rank, max_boxes)].set(
        idx, mode="drop")
    ends = ends.at[jnp.where(is_end, end_rank, max_boxes)].set(
        idx + 1, mode="drop")
    num = jnp.sum(is_start.astype(jnp.int32))
    valid = jnp.arange(max_boxes) < num
    boxes = jnp.stack([starts, ends], axis=-1) * valid[:, None]
    return boxes, valid


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("thresh",))
def nms_masked(scores, bboxes, thresh: float, valid=None) -> Array:
    """Jittable greedy score-sorted NMS over 1-D LR boxes.

    Reproduces bbox_helper.py:80-118: boxes with ``left >= right`` are
    dropped; processing order is descending score; a surviving box
    suppresses all others with ``iou >= thresh``.  Ties are broken
    DETERMINISTICALLY here (stable ascending sort flipped => larger
    original index first); the reference's ``argsort()`` is numpy's
    default introsort, whose tie order is unspecified — so on exactly
    tied scores (e.g. sigmoid saturation) the kept set can legitimately
    differ from a particular numpy run, and from the host twin ``nms``.

    :param scores: [N] confidences.
    :param bboxes: [N, 2] LR boxes.
    :param thresh: IoU threshold (suppress when iou >= thresh).
    :param valid: optional [N] bool mask of live entries (for padded input).
    :return: keep [N] bool mask over the *original* order.
    """
    scores = jnp.asarray(scores, jnp.float32)
    bboxes = jnp.asarray(bboxes, jnp.float32)
    n = scores.shape[0]
    alive = bboxes[:, 0] < bboxes[:, 1]
    if valid is not None:
        alive = alive & jnp.asarray(valid, bool)

    # numpy argsort ascending is stable; reversed => desc with ties reversed.
    order = jnp.flip(jnp.argsort(scores, stable=True))

    # work in score-sorted space so the scan streams matrix rows as inputs
    # instead of dynamically gathering them (compiles and runs much faster)
    boxes_s = bboxes[order]
    iou_s = iou_lr(boxes_s[:, None, :], boxes_s[None, :, :])   # [N, N]
    suppress_s = iou_s >= thresh
    alive_s = alive[order]
    eye = jnp.eye(n, dtype=bool)

    def body(alive_, xs):
        row_suppress, onehot = xs
        take = jnp.any(alive_ & onehot)
        alive_ = alive_ & ~(take & row_suppress)
        return alive_, take

    _, keep_s = jax.lax.scan(body, alive_s, (suppress_s, eye))
    return jnp.zeros((n,), bool).at[order].set(keep_s)


def nms(scores: np.ndarray, bboxes: np.ndarray,
        thresh: float) -> Tuple[np.ndarray, np.ndarray]:
    """Host convenience NMS with reference-identical output ordering.

    Returns (keep_scores, keep_bboxes) sorted by descending score, matching
    bbox_helper.py:80-118.
    """
    scores = np.asarray(scores)
    bboxes = np.asarray(bboxes)
    if scores.size == 0:
        return scores, bboxes
    keep = np.asarray(nms_masked(scores, bboxes, thresh))
    kept_idx = np.where(keep)[0]
    # reference returns in processing (descending-score) order
    order = np.argsort(scores[kept_idx], kind="stable")[::-1]
    kept_idx = kept_idx[order]
    return scores[kept_idx], bboxes[kept_idx]
