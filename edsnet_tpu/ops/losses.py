"""Training losses (anchor-based + anchor-free), masked & jittable.

Reference: `src/anchor_based/losses.py`, `src/anchor_free/losses.py`.
All reductions are masked means/sums so the same code path handles padded
length buckets; with a full mask and batch 1 they reduce to the reference
semantics exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
_EPS = 1e-8


def _masked_mean(x, mask):
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def smooth_l1(pred, target):
    """torch F.smooth_l1_loss elementwise (beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


# ---------------------------------------------------------------------------
# anchor-based
# ---------------------------------------------------------------------------

def ab_loc_loss(pred_loc, test_loc, cls_label, use_smooth: bool = True):
    """Smooth-L1 on positive anchors. (anchor_based/losses.py:5-29)

    :param pred_loc: [..., S, 2]; test_loc same; cls_label [..., S] with 1 = pos.
    """
    pos = (jnp.asarray(cls_label) == 1)[..., None]
    pos = jnp.broadcast_to(pos, pred_loc.shape)
    err = smooth_l1(pred_loc, test_loc) if use_smooth \
        else jnp.abs(pred_loc - test_loc)
    return _masked_mean(err, pos)


def ab_cls_loss(pred, test, eps: float = _EPS):
    """0.5 * (mean -log p over pos + mean -log(1-p) over neg).

    (anchor_based/losses.py:32-57; label 1 = positive, -1 = negative,
    0 = ignored.)
    """
    pred = jnp.asarray(pred, jnp.float32).reshape(-1)
    test = jnp.asarray(test).reshape(-1)
    pos = test == 1
    neg = test == -1
    loss_pos = _masked_mean(-jnp.log(jnp.maximum(pred, eps)), pos)
    loss_neg = _masked_mean(-jnp.log(jnp.maximum(1.0 - pred, eps)), neg)
    return 0.5 * (loss_pos + loss_neg)


# ---------------------------------------------------------------------------
# anchor-free
# ---------------------------------------------------------------------------

def focal_loss(x, y, alpha: float = 0.25, gamma: float = 2.0,
               reduction: str = "sum", weight=None):
    """Binary focal loss over two-column predictions. (anchor_free/losses.py:111-147)

    :param x: [N, 2] columns (1-p, p); y: [N] labels in {0, 1}.
    :param weight: optional [N] mask applied before reduction.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y).astype(jnp.int32)
    t = jax.nn.one_hot(y, x.shape[-1], dtype=x.dtype)
    p_t = x * t + (1 - x) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    fl = -alpha_t * (1 - p_t) ** gamma * jnp.log(jnp.maximum(p_t, _EPS))
    if weight is not None:
        fl = fl * weight[..., None]
    if reduction == "sum":
        return jnp.sum(fl)
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "none":
        return fl
    raise ValueError(f"Invalid reduction mode {reduction}")


def af_cls_loss(pred, test, kind: str = "focal", mask=None):
    """Classification loss normalized by #positives. (anchor_free/losses.py:5-31)"""
    pred = jnp.asarray(pred, jnp.float32).reshape(-1)
    test = jnp.asarray(test).reshape(-1)
    if mask is None:
        mask = jnp.ones_like(pred, bool)
    else:
        mask = jnp.asarray(mask, bool).reshape(-1)
    test_i = test.astype(jnp.int32)
    num_pos = jnp.maximum(jnp.sum(jnp.where(mask, test_i, 0)), 1)

    two_col = jnp.stack([1.0 - pred, pred], axis=-1)
    if kind == "focal":
        loss = focal_loss(two_col, test_i, reduction="sum",
                          weight=mask.astype(pred.dtype))
    elif kind == "cross-entropy":
        logp = jnp.log(jnp.maximum(two_col, _EPS))
        nll = -jnp.take_along_axis(logp, test_i[:, None], axis=-1)[:, 0]
        loss = _masked_mean(nll, mask)
    else:
        raise ValueError(f"Invalid loss type {kind}")
    return loss / num_pos.astype(jnp.float32)


def iou_offset(offset_a, offset_b, eps: float = _EPS):
    """IoU between LR extent pairs. (anchor_free/losses.py:34-57)"""
    a_l, a_r = offset_a[..., 0], offset_a[..., 1]
    b_l, b_r = offset_b[..., 0], offset_b[..., 1]
    len_a = a_l + a_r
    len_b = b_l + b_r
    inter = jnp.minimum(a_l, b_l) + jnp.minimum(a_r, b_r)
    inter = jnp.maximum(inter, 0.0)
    union = len_a + len_b - inter
    union = jnp.where(union <= 0, eps, union)
    return inter / union


def af_loc_loss(pred_loc, test_loc, cls_label, kind: str = "soft-iou",
                eps: float = _EPS):
    """Soft-IoU / smooth-L1 regression on positives. (anchor_free/losses.py:60-87)"""
    pos = jnp.asarray(cls_label).astype(bool)
    if kind == "soft-iou":
        iou = iou_offset(pred_loc, test_loc)
        return _masked_mean(-jnp.log(iou + eps), pos)
    if kind == "smooth-l1":
        posb = jnp.broadcast_to(pos[..., None], pred_loc.shape)
        return _masked_mean(smooth_l1(pred_loc, test_loc), posb)
    raise ValueError(f"Invalid loss type {kind}")


def af_ctr_loss(pred, test, pos_mask):
    """BCE on positive positions. (anchor_free/losses.py:90-97)"""
    pos = jnp.asarray(pos_mask).astype(bool)
    p = jnp.clip(jnp.asarray(pred, jnp.float32), _EPS, 1.0 - _EPS)
    t = jnp.asarray(test, jnp.float32)
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    return _masked_mean(bce, pos)
