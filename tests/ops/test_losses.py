"""loss spec — values ported from reference tests/anchor_based/test_ab_losses.py
and tests/anchor_free/test_af_losses.py."""
import math

import jax.numpy as jnp
import numpy as np

from edsnet_tpu.ops import losses


def test_ab_cls_loss():
    pred = np.array([[0.4, 0.6], [0.0, 0.4], [0.9, 0.8], [0.3, 0.2]],
                    dtype=np.float32)
    test = np.array([[1, -1], [0, 0], [1, 0], [-1, 0]], dtype=np.int32)
    out = float(losses.ab_cls_loss(pred, test))
    ans = (-math.log(.4) - math.log(.9)
           - math.log(1 - .6) - math.log(1 - .3)) / 4
    assert math.isclose(out, ans, abs_tol=1e-5)


def test_ab_loc_loss():
    pred = np.array([[0, 1], [2, 3], [4, 5]], dtype=np.float32)[:, None, :]
    test = np.array([[0.5, 2], [-1, 5], [4, 5]], dtype=np.float32)[:, None, :]
    cls_label = np.array([1, 1, 0], dtype=np.int32)[:, None]

    l1 = float(losses.ab_loc_loss(pred, test, cls_label, use_smooth=False))
    assert math.isclose(l1, (0.5 + 1 + 3 + 2) / 4, abs_tol=1e-5)

    sl1 = float(losses.ab_loc_loss(pred, test, cls_label, use_smooth=True))
    assert math.isclose(sl1, (0.125 + 0.5 + 2.5 + 1.5) / 4, abs_tol=1e-5)


def test_focal_loss():
    alpha, gamma = 0.25, 2
    pred = np.array([[0.6, 0.4], [0.3, 0.7]], dtype=np.float32)
    test = np.array([0, 1], dtype=np.int32)
    out = float(losses.focal_loss(pred, test))

    answer = 0.0
    alpha_t = np.array([alpha, 1 - alpha])
    p_t = np.array([0.6, 1 - 0.4])
    answer += float((-alpha_t * (1 - p_t) ** gamma * np.log(p_t)).sum())
    alpha_t = np.array([1 - alpha, alpha])
    p_t = np.array([1 - 0.3, 0.7])
    answer += float((-alpha_t * (1 - p_t) ** gamma * np.log(p_t)).sum())
    assert math.isclose(out, answer, rel_tol=1e-3)


def test_iou_offset():
    offset_a = np.array([[1, 1], [3, 2]], dtype=np.float32)
    offset_b = np.array([[4, 2], [2, 5]], dtype=np.float32)
    out = np.asarray(losses.iou_offset(offset_a, offset_b))
    assert np.isclose(out, [2 / 6, 4 / 8]).all()


def test_af_cls_loss():
    pred = np.array([0.4, 0.7], dtype=np.float32)
    test = np.array([0, 1], dtype=np.int32)

    out = float(losses.af_cls_loss(pred, test, kind="focal"))
    two_col = np.array([[0.6, 0.4], [0.3, 0.7]], dtype=np.float32)
    ans = float(losses.focal_loss(two_col, test, reduction="sum")) / 1
    assert math.isclose(out, ans, rel_tol=1e-3)

    out = float(losses.af_cls_loss(pred, test, kind="cross-entropy"))
    ans = (-math.log(1 - 0.4) - math.log(0.7)) / 2 / 1
    assert math.isclose(out, ans, rel_tol=1e-3)


def test_af_loc_loss():
    pred = np.array([[1, 1], [3, 2], [8, 7]], dtype=np.float32)
    test = np.array([[4, 2], [2, 5], [6, 9]], dtype=np.float32)
    w = np.array([1, 1, 0], dtype=np.float32)

    out = float(losses.af_loc_loss(pred, test, w, kind="soft-iou"))
    iou = np.array([2 / 6, 4 / 8])
    assert math.isclose(out, float(-np.log(iou + 1e-8).mean()), rel_tol=1e-3)

    out = float(losses.af_loc_loss(pred, test, w, kind="smooth-l1"))
    d = np.abs(pred[:2] - test[:2])
    sl1 = np.where(d < 1, 0.5 * d * d, d - 0.5).mean()
    assert math.isclose(out, float(sl1), rel_tol=1e-3)


def test_af_ctr_loss():
    pred = np.array([0.4, 0.6, 0.3, 0.8], dtype=np.float32)
    test = np.array([0.8, 0.1, 0.6, 0.4], dtype=np.float32)
    pos = np.array([1, 0, 1, 0], dtype=bool)
    out = float(losses.af_ctr_loss(pred, test, pos))
    p = np.array([0.4, 0.3])
    t = np.array([0.8, 0.6])
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    assert math.isclose(out, float(bce), rel_tol=1e-3)


def test_masked_matches_dense():
    """Padded entries excluded via mask must not change the AF cls loss."""
    pred = np.array([0.4, 0.7, 0.99, 0.01], dtype=np.float32)
    test = np.array([0, 1, 1, 0], dtype=np.int32)
    mask = np.array([1, 1, 0, 0], dtype=bool)
    masked = float(losses.af_cls_loss(pred, test, kind="focal", mask=mask))
    dense = float(losses.af_cls_loss(pred[:2], test[:2], kind="focal"))
    assert math.isclose(masked, dense, rel_tol=1e-6)
