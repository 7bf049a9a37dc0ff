"""bbox ops spec — values ported from reference tests/helpers/test_bbox_helper.py."""
import numpy as np

from edsnet_tpu.ops import bbox


def test_lr2cw():
    lr = np.array([[1, 3], [2, 7], [19, 50]])
    assert np.isclose(bbox.lr2cw(lr), [[2, 2], [4.5, 5], [34.5, 31]]).all()

    lr = np.array([[1.25, 2.75], [1.485, 3.123]])
    assert np.isclose(bbox.lr2cw(lr), [[2, 1.5], [2.304, 1.638]]).all()


def test_cw2lr():
    cw = np.array([[2, 8], [6, 7]])
    assert np.isclose(bbox.cw2lr(cw), [[-2, 6], [2.5, 9.5]]).all()

    cw = np.array([[1.524, 9.428], [4.518, 1.025]])
    assert np.isclose(bbox.cw2lr(cw),
                      [[-3.19, 6.238], [4.0055, 5.0305]]).all()


def test_seq2bbox():
    seq = np.array([0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1])
    assert np.isclose(bbox.seq2bbox(seq), [[1, 5], [8, 10], [15, 18]]).all()

    assert not bbox.seq2bbox(np.array([0, 0, 0])).any()
    assert not bbox.seq2bbox(np.array([])).any()


def test_seq2bbox_masked_matches_host():
    rng = np.random.RandomState(0)
    for _ in range(20):
        seq = (rng.rand(37) > 0.5).astype(np.int32)
        host = bbox.seq2bbox(seq)
        boxes, valid = bbox.seq2bbox_masked(seq, max_boxes=20)
        boxes = np.asarray(boxes)[np.asarray(valid)]
        assert boxes.shape == host.shape
        if host.size:
            assert (boxes == host).all()


class TestIou:
    anchor_lr = np.array([[1, 5]] * 5, dtype=np.float32)
    target_lr = np.array([[1, 5], [0, 6], [2, 4], [3, 8], [8, 9]],
                         dtype=np.float32)
    answer = np.array([1, 4 / 6, 2 / 4, 2 / 7, 0])

    def test_iou_lr(self):
        assert np.isclose(bbox.iou_lr(self.anchor_lr, self.target_lr),
                          self.answer).all()

    def test_iou_cw(self):
        a_cw = np.asarray(bbox.lr2cw(self.anchor_lr))
        t_cw = np.asarray(bbox.lr2cw(self.target_lr))
        assert np.isclose(bbox.iou_cw(a_cw, t_cw), self.answer).all()


def test_nms():
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    boxes = np.array([[1, 5], [2, 4], [4, 8], [5, 9]])
    keep_scores, keep_boxes = bbox.nms(scores, boxes, 0.5)
    assert np.isclose(keep_scores, [0.9, 0.7]).all()
    assert np.isclose(keep_boxes, [[1, 5], [4, 8]]).all()


def test_nms_invalid_boxes_dropped():
    scores = np.array([0.9, 0.8])
    boxes = np.array([[5, 5], [2, 4]])  # first box is degenerate
    keep_scores, keep_boxes = bbox.nms(scores, boxes, 0.5)
    assert np.isclose(keep_scores, [0.8]).all()
    assert np.isclose(keep_boxes, [[2, 4]]).all()


def _reference_nms(scores, bboxes, thresh):
    """Direct transcription of the reference greedy loop (spec oracle)."""
    valid = bboxes[:, 0] < bboxes[:, 1]
    scores, bboxes = scores[valid], bboxes[valid]
    order = scores.argsort()[::-1]
    s, b = scores[order], bboxes[order]
    ks, kb = [], []
    while b.size > 0:
        ks.append(s[0])
        kb.append(b[0])
        il = np.maximum(b[:, 0], b[0, 0])
        ir = np.minimum(b[:, 1], b[0, 1])
        ul = np.minimum(b[:, 0], b[0, 0])
        ur = np.maximum(b[:, 1], b[0, 1])
        inter = np.clip(ir - il, 0, None)
        union = ur - ul
        union = np.where(union <= 0, 1e-6, union)
        iou = inter / union
        keep = iou < thresh
        s, b = s[keep], b[keep]
    return np.asarray(ks), np.asarray(kb).reshape(-1, 2)


def test_nms_random_parity():
    rng = np.random.RandomState(1)
    n = 40  # fixed shape: one trace of the scan
    for _ in range(8):
        left = rng.randint(0, 50, n)
        width = rng.randint(0, 12, n)
        boxes = np.stack([left, left + width], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        ref_s, ref_b = _reference_nms(scores, boxes, 0.4)
        out_s, out_b = bbox.nms(scores, boxes, 0.4)
        assert np.allclose(out_s, ref_s)
        assert np.allclose(out_b, ref_b)
