"""Loss parity on random inputs: reference torch losses vs ops/losses.py."""
from __future__ import annotations

import numpy as np
import torch

from edsnet_tpu.ops import losses as L
from tests.parity.conftest import assert_close


def rand_ab(seed=0, n=40, s=3):
    rng = np.random.RandomState(seed)
    pred_cls = rng.uniform(0.05, 0.95, (n, s)).astype(np.float32)
    pred_loc = rng.randn(n, s, 2).astype(np.float32)
    test_loc = rng.randn(n, s, 2).astype(np.float32)
    cls_label = rng.choice([-1.0, 0.0, 1.0], (n, s),
                           p=[0.3, 0.5, 0.2]).astype(np.float32)
    return pred_cls, pred_loc, test_loc, cls_label


def test_ab_cls_loss_parity(ref):
    pred_cls, _, _, cls_label = rand_ab()
    ours = L.ab_cls_loss(pred_cls, cls_label)
    theirs = ref.ab_losses.calc_cls_loss(torch.from_numpy(pred_cls),
                                         torch.from_numpy(cls_label))
    assert_close(ours, theirs, what="ab_cls")


def test_ab_loc_loss_parity(ref):
    _, pred_loc, test_loc, cls_label = rand_ab()
    for smooth in (True, False):
        ours = L.ab_loc_loss(pred_loc, test_loc, cls_label,
                             use_smooth=smooth)
        theirs = ref.ab_losses.calc_loc_loss(
            torch.from_numpy(pred_loc), torch.from_numpy(test_loc),
            torch.from_numpy(cls_label), use_smooth=smooth)
        assert_close(ours, theirs, what=f"ab_loc smooth={smooth}")


def rand_af(seed=1, n=50):
    rng = np.random.RandomState(seed)
    pred_cls = rng.uniform(0.05, 0.95, n).astype(np.float32)
    target = (rng.rand(n) > 0.6).astype(np.float32)
    pred_loc = rng.uniform(0.5, 6.0, (n, 2)).astype(np.float32)
    test_loc = rng.uniform(0.5, 6.0, (n, 2)).astype(np.float32)
    pred_ctr = rng.uniform(0.05, 0.95, n).astype(np.float32)
    test_ctr = rng.uniform(0.0, 1.0, n).astype(np.float32)
    return pred_cls, target, pred_loc, test_loc, pred_ctr, test_ctr


def test_af_cls_loss_parity(ref):
    pred_cls, target, *_ = rand_af()
    for kind in ("focal", "cross-entropy"):
        ours = L.af_cls_loss(pred_cls, target, kind=kind)
        theirs = ref.af_losses.calc_cls_loss(
            torch.from_numpy(pred_cls), torch.from_numpy(target), kind=kind)
        assert_close(ours, theirs, rtol=1e-4, what=f"af_cls {kind}")


def test_af_loc_loss_parity(ref):
    _, target, pred_loc, test_loc, *_ = rand_af()
    for kind in ("soft-iou", "smooth-l1"):
        ours = L.af_loc_loss(pred_loc, test_loc, target, kind=kind)
        theirs = ref.af_losses.calc_loc_loss(
            torch.from_numpy(pred_loc), torch.from_numpy(test_loc),
            torch.from_numpy(target), kind=kind)
        assert_close(ours, theirs, rtol=1e-4, what=f"af_loc {kind}")


def test_af_ctr_loss_parity(ref):
    pred_cls, target, _, _, pred_ctr, test_ctr = rand_af()
    ours = L.af_ctr_loss(pred_ctr, test_ctr, target)
    theirs = ref.af_losses.calc_ctr_loss(
        torch.from_numpy(pred_ctr), torch.from_numpy(test_ctr),
        torch.from_numpy(target))
    assert_close(ours, theirs, rtol=1e-4, what="af_ctr")


def test_iou_offset_parity(ref):
    _, _, pred_loc, test_loc, *_ = rand_af()
    ours = L.iou_offset(pred_loc, test_loc)
    theirs = ref.af_losses.iou_offset(torch.from_numpy(pred_loc),
                                      torch.from_numpy(test_loc))
    assert_close(ours, theirs, rtol=1e-5, what="iou_offset")
