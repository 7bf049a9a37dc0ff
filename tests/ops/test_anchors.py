"""anchor ops spec — from reference tests/anchor_based/test_anchor_helper.py
and tests/anchor_free/test_anchor_free_helper.py."""
import jax
import numpy as np

from edsnet_tpu.ops import anchor_free, anchors


class TestAnchorHelper:
    seq_len = 5
    anchor_scales = [2, 4]
    anchors_ans = np.array([[[0, 2], [0, 4]],
                            [[1, 2], [1, 4]],
                            [[2, 2], [2, 4]],
                            [[3, 2], [3, 4]],
                            [[4, 2], [4, 4]]], dtype=np.int32)
    targets = np.array([[3, 2], [0.5, 1]], dtype=np.float32)
    iou_thresh = 0.499
    pos_cls = np.array([[1, 0], [1, 0], [0, 1], [1, 1], [0, 1]],
                       dtype=np.int32)
    loc_label = np.array([
        [[0.25, np.log(0.5)], [0, 0]],
        [[-0.25, np.log(0.5)], [0, 0]],
        [[0, 0], [0.25, np.log(0.5)]],
        [[0, 0], [0, np.log(0.5)]],
        [[0, 0], [-0.25, np.log(0.5)]],
    ], dtype=np.float32)
    num_neg = 3
    pred_bboxes = np.array([[[0.5, 1], [0, 0]],
                            [[0.5, 1], [0, 0]],
                            [[0, 0], [3, 2]],
                            [[3, 2], [3, 2]],
                            [[0, 0], [3, 2]]], dtype=np.float32)

    def test_get_anchors(self):
        out = anchors.get_anchors(self.seq_len, self.anchor_scales)
        assert np.isclose(self.anchors_ans, np.asarray(out)).all()

    def test_get_pos_label(self):
        out_cls, out_loc = anchors.get_pos_label(
            self.anchors_ans, self.targets, self.iou_thresh)
        assert np.isclose(self.pos_cls, np.asarray(out_cls)).all()
        assert np.isclose(self.loc_label, np.asarray(out_loc)).all()

    def test_get_pos_label_with_padding(self):
        padded = np.concatenate(
            [self.targets, np.zeros((3, 2), np.float32)], axis=0)
        valid = np.array([1, 1, 0, 0, 0], dtype=bool)
        out_cls, out_loc = anchors.get_pos_label(
            self.anchors_ans, padded, self.iou_thresh, target_valid=valid)
        assert np.isclose(self.pos_cls, np.asarray(out_cls)).all()
        assert np.isclose(self.loc_label, np.asarray(out_loc)).all()

    def test_get_neg_label(self):
        rng = jax.random.PRNGKey(0)
        cls_label = np.asarray(
            anchors.get_neg_label(self.pos_cls, self.num_neg, rng))
        assert (cls_label == -1).sum() == self.num_neg
        assert ((cls_label == 1) == (self.pos_cls == 1)).all()

    def test_offset2bbox(self):
        bboxes = anchors.offset2bbox(self.loc_label, self.anchors_ans)
        bboxes = np.asarray(bboxes).reshape((self.seq_len, 2, 2))
        bboxes = np.expand_dims(self.pos_cls, -1) * bboxes
        assert np.isclose(bboxes, self.pred_bboxes).all()

    def test_bbox2offset_roundtrip(self):
        anch = np.asarray(anchors.get_anchors(8, [4])).reshape(-1, 2)
        boxes = np.stack([np.arange(8) + 0.5, np.full(8, 3.0)], -1)
        off = anchors.bbox2offset(boxes, anch)
        back = anchors.offset2bbox(off, anch)
        assert np.allclose(np.asarray(back), boxes, atol=1e-3)  # float32 exp/log


class TestAnchorFreeHelper:
    """From reference tests/anchor_free/test_anchor_free_helper.py semantics."""

    def test_get_loc_label(self):
        # exact vector from reference tests/anchor_free/test_anchor_free_helper.py
        target = np.array([0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 0])
        out = np.asarray(anchor_free.get_loc_label(target))
        ans = np.array([[0, 0], [0, 0], [0, 0], [0, 3], [1, 2], [2, 1],
                        [3, 0], [0, 0], [0, 0], [0, 2], [1, 1], [2, 0],
                        [0, 0]], dtype=np.float32)
        assert np.isclose(out, ans).all()

    def test_get_loc_label_empty(self):
        out = np.asarray(anchor_free.get_loc_label(np.zeros(6, np.int32)))
        assert not out.any()

    def test_get_loc_label_full(self):
        out = np.asarray(anchor_free.get_loc_label(np.ones(4, np.int32)))
        ans = np.array([[0, 3], [1, 2], [2, 1], [3, 0]], dtype=np.float32)
        assert np.isclose(out, ans).all()

    def test_get_ctr_label(self):
        # exact vector from reference tests/anchor_free/test_anchor_free_helper.py
        target = np.array([0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 0])
        offset = np.asarray(anchor_free.get_loc_label(target))
        ctr = np.asarray(anchor_free.get_ctr_label(target, offset))
        ans = np.array([0, 0, 0, 0, 0.5, 0.5, 0, 0, 0, 0, 1, 0, 0])
        assert np.isclose(ctr, ans, atol=1e-6).all()

    def test_offset2bbox(self):
        offset = np.array([[1, 2], [3, 4]], dtype=np.float32)
        out = np.asarray(anchor_free.offset2bbox(offset))
        ans = np.array([[-1, 3], [-2, 6]], dtype=np.float32)
        assert np.isclose(out, ans).all()


def test_numpy_label_twins_match_jnp():
    """The host label-prep path (pure numpy, no compiles) must equal the
    jittable ops exactly."""
    import numpy as np
    from edsnet_tpu.ops import anchors as A
    from edsnet_tpu.ops import anchor_free as AF

    rng = np.random.RandomState(0)
    n, scales = 50, [4, 8]
    anchors_j = np.asarray(A.get_anchors(n, scales))
    anchors_n = A.get_anchors_np(n, scales)
    np.testing.assert_array_equal(anchors_j, anchors_n)

    targets = np.asarray([[10.5, 5.0], [30.0, 8.0], [0.0, 1.0]], np.float32)
    t_valid = np.asarray([True, True, False])
    for thresh in (0.0, 0.3, 0.6):
        cj, lj = A.get_pos_label(anchors_j, targets, thresh,
                                 target_valid=t_valid)
        cn, ln = A.get_pos_label_np(anchors_n, targets, thresh,
                                    target_valid=t_valid)
        np.testing.assert_array_equal(np.asarray(cj), cn)
        np.testing.assert_allclose(np.asarray(lj), ln, rtol=1e-6)

    mask = (rng.rand(64) > 0.6).astype(np.int32)
    loc_j = np.asarray(AF.get_loc_label(mask))
    loc_n = AF.get_loc_label_np(mask)
    np.testing.assert_allclose(loc_j, loc_n, rtol=1e-6)
    ctr_j = np.asarray(AF.get_ctr_label(mask, loc_j))
    ctr_n = AF.get_ctr_label_np(mask, loc_n)
    np.testing.assert_allclose(ctr_j, ctr_n, rtol=1e-6)
