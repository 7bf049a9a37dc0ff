"""End-to-end accuracy parity: full training runs in both frameworks.

The reference training loop (anchor_based/train.py:60-145 — per-video
label generation through vsumm/bbox/anchor helpers, torch forward, Adam)
runs verbatim against the reference torch DSNet on a learnable synthetic
dataset, and our trainer runs on the same h5.  Both train long enough to
converge on the signal; their best validation F-scores must land in the
same band.  Dropout draws can't be aligned across frameworks, so this is
a statistical check on converged quality, complementing the deterministic
5-step trajectory test.
"""
import argparse
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from test_learning import _make_learnable_h5  # noqa: E402

FEAT, HIDDEN, SCALES = 24, 16, (4,)
LR, EPOCHS = 1e-3, 100


def _load_records(split_path, tmp_path, keys):
    from edsnet_tpu.data.dataset import VideoDataset
    ds = VideoDataset(keys, str(tmp_path))
    return [ds[i] for i in range(len(ds))]


def _reference_training_run(ref, records, val_records, seed=0):
    """The reference AB trainer loop, reimplemented step-for-step."""
    from tests.parity import bridge  # noqa: F401 (keeps import graph warm)

    torch.manual_seed(seed)
    model = ref.ab_dsnet.DSNet(
        "linear", FEAT, HIDDEN, list(SCALES), 2, fc_depth=1,
        orientation="paper", pooling_type="roi")
    # reference init (anchor_based/train.py:19-24)
    for m in model.modules():
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.xavier_uniform_(m.weight, gain=np.sqrt(2.0))
            if m.bias is not None:
                torch.nn.init.constant_(m.bias, 0.1)
    optimizer = torch.optim.Adam(model.parameters(), lr=LR,
                                 weight_decay=0.0)
    rng = np.random.RandomState(seed)

    def evaluate_ref():
        model.eval()
        f1s = []
        with torch.no_grad():
            for r in val_records:
                seq = torch.from_numpy(r.seq.astype(np.float32))
                pred_cls, pred_bboxes = model.predict(seq.unsqueeze(0))
                pred_bboxes = np.clip(pred_bboxes, 0,
                                      r.seq.shape[0]).round().astype(
                                          np.int32)
                pred_cls, pred_bboxes = ref.bbox_helper.nms(
                    pred_cls, pred_bboxes, 0.5)
                summ = ref.vsumm_helper.bbox2summary(
                    r.seq.shape[0], pred_cls, pred_bboxes, r.cps,
                    r.n_frames, r.nfps, r.picks)
                f1s.append(ref.vsumm_helper.get_summ_f1score(
                    summ, r.user_summary, "avg"))
        model.train()
        return float(np.mean(f1s))

    best = -1.0
    for epoch in range(EPOCHS):
        order = rng.permutation(len(records))
        for i in order:
            r = records[i]
            keyshot = ref.vsumm_helper.get_keyshot_summ(
                r.gtscore, r.cps, r.n_frames, r.nfps, r.picks)
            target = ref.vsumm_helper.downsample_summ(keyshot)
            if not target.any():
                continue
            tb = ref.bbox_helper.seq2bbox(target)
            tb = ref.bbox_helper.lr2cw(tb)
            anchors = ref.anchor_helper.get_anchors(target.size,
                                                    list(SCALES))
            cls_label, loc_label = ref.anchor_helper.get_pos_label(
                anchors, tb, 0.6)
            num_pos = cls_label.sum()
            neg, _ = ref.anchor_helper.get_pos_label(anchors, tb, 0.0)
            neg = ref.anchor_helper.get_neg_label(neg, int(2.0 * num_pos))
            inc, _ = ref.anchor_helper.get_pos_label(anchors, tb, 0.3)
            inc[neg != 1] = 1
            inc = ref.anchor_helper.get_neg_label(inc, int(1.0 * num_pos))
            cls_label[neg == -1] = -1
            cls_label[inc == -1] = -1

            seq = torch.from_numpy(r.seq.astype(np.float32)).unsqueeze(0)
            pred_cls, pred_loc = model(seq)
            loss = ref.ab_losses.calc_cls_loss(
                pred_cls, torch.from_numpy(cls_label.astype(np.float32))) \
                + ref.ab_losses.calc_loc_loss(
                    pred_loc,
                    torch.from_numpy(loc_label.astype(np.float32)),
                    torch.from_numpy(cls_label.astype(np.float32)))
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
        if (epoch + 1) % 10 == 0 or epoch == EPOCHS - 1:
            best = max(best, evaluate_ref())
    return best


def test_converged_fscore_parity(ref, tmp_path):
    from edsnet_tpu.data.dataset import load_yaml
    from edsnet_tpu.trainer import train

    split_path = _make_learnable_h5(tmp_path)
    split = load_yaml(split_path)[0]
    records = _load_records(split_path, tmp_path, split["train_keys"])
    val_records = _load_records(split_path, tmp_path, split["test_keys"])

    ref_best = _reference_training_run(ref, records, val_records)

    args = argparse.Namespace(
        model="anchor-based", model_depth="shallow", base_model="linear",
        orientation="paper", pooling_type="roi", num_feature=FEAT,
        num_hidden=HIDDEN, num_head=2, fc_depth=1, attention_depth=1,
        encoder_type="classic", anchor_scales=SCALES, lr=LR,
        weight_decay=0.0, lambda_reg=1.0, lambda_ctr=1.0, cls_loss="focal",
        reg_loss="soft-iou", nms_thresh=0.5, max_epoch=EPOCHS, seed=0,
        data_root=str(tmp_path), batch_size=1, bucket_size=32,
        num_devices=1, model_dir=str(tmp_path / "m"), profile=False,
        eval_every=10, resume=False,
        neg_sample_ratio=2.0, incomplete_sample_ratio=1.0,
        pos_iou_thresh=0.6, neg_iou_thresh=0.0, incomplete_iou_thresh=0.3)
    ours_best, _, _ = train(args, split, tmp_path / "ckpt.pt")

    # both frameworks must converge into the same quality band on the
    # learnable signal (runs are stochastic: dropout + negative sampling)
    assert ref_best > 0.35, f"reference failed to learn: {ref_best}"
    assert ours_best > 0.35, f"ours failed to learn: {ours_best}"
    assert abs(ours_best - ref_best) < 0.15, (ours_best, ref_best)
