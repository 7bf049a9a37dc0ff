"""Evaluation: predict -> NMS (device) -> keyshot summary -> F-score.

Reference: `src/evaluate.py`.  The forward + anchor decode + NMS run as one
jitted program per length bucket (the reference round-trips predictions to
NumPy per video, evaluate.py:24-28); summary assembly (knapsack over shots)
runs on the host via the native C++ solver.

Also the CLI: per-split checkpoint load + F-score/diversity report,
`eval_metric='avg' if 'tvsum' in key else 'max'` (evaluate.py:32-34).
"""
from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu import config as config_lib
from edsnet_tpu.data import batching
from edsnet_tpu.data.dataset import (AverageMeter, DataLoader, VideoDataset,
                                     get_ckpt_path, load_yaml)
from edsnet_tpu.models.model_zoo import get_model
from edsnet_tpu.native import load as _native_load
from edsnet_tpu.ops import bbox as bbox_ops
from edsnet_tpu.ops import summary as summ_ops
from edsnet_tpu.utils import checkpoint as ckpt_lib

logger = logging.getLogger()


@partial(jax.jit, static_argnames=("model", "num_scales", "nms_thresh"))
def _predict_nms(model, variables, seq, mask, lens, num_scales: int,
                 nms_thresh: float, motion=None, motion_mask=None):
    """Jitted predict + clip/round + masked NMS for a padded batch."""
    if motion is not None:
        pred_cls, boxes = model.apply(variables, seq, motion, mask,
                                      motion_mask, method="predict")
    else:
        pred_cls, boxes = model.apply(variables, seq, mask, method="predict")
    b, total = pred_cls.shape
    n = total // num_scales
    positions = jnp.arange(total) // num_scales

    def one(cls_i, boxes_i, len_i):
        valid = positions < len_i
        boxes_c = jnp.round(jnp.clip(boxes_i, 0, len_i)).astype(jnp.float32)
        keep = bbox_ops.nms_masked(cls_i, boxes_c, nms_thresh, valid)
        return keep, boxes_c

    keeps, boxes_c = jax.vmap(one)(pred_cls, boxes, lens)
    return pred_cls, boxes_c, keeps


class KnapsackAudit:
    """Tie-selection audit: DP vs C++ branch&bound shot selection.

    Both solvers are exact on the optimal *value*, but tied optima admit
    multiple item sets and the two implementations (like the reference's
    ortools B&B, vsumm_helper.py:26-45) break ties differently.  A tie flip
    changes the summary, so on real data this audit quantifies how much of
    the ±0.5-pt F budget tie divergence actually consumes: per video it
    solves the summary both ways and records whether the summaries differ
    and the F-score delta.
    """

    def __init__(self):
        self.n_videos = 0
        self.n_diverged = 0
        self.abs_df: List[float] = []
        self.available = _native_load() is not None

    def check(self, record, kept_cls, kept_boxes, eval_metric: str,
              pred_summ: np.ndarray) -> None:
        """Compare the SHIPPED summary (``pred_summ``, already computed by
        the caller with the default solver) against the forced-B&B
        selection — one extra solve per video, not three."""
        if not self.available:
            return
        self.n_videos += 1
        seq_len = record.seq.shape[0]
        summ_bnb = summ_ops.bbox2summary(
            seq_len, kept_cls, kept_boxes, record.cps, record.n_frames,
            record.nfps, record.picks, solver="bnb")
        if np.array_equal(pred_summ, summ_bnb):
            return
        self.n_diverged += 1
        f_dp = summ_ops.get_summ_f1score(pred_summ, record.user_summary,
                                         eval_metric)
        f_bnb = summ_ops.get_summ_f1score(summ_bnb, record.user_summary,
                                          eval_metric)
        self.abs_df.append(abs(f_dp - f_bnb))
        logger.info("knapsack tie divergence on %s: F(dp)=%.4f F(bnb)=%.4f",
                    record.key, f_dp, f_bnb)

    def report(self) -> str:
        if not self.available:
            return "knapsack audit: native B&B unavailable, audit skipped"
        if not self.n_diverged:
            return (f"knapsack audit: 0/{self.n_videos} videos diverged "
                    f"(DP and B&B selections identical)")
        return (f"knapsack audit: {self.n_diverged}/{self.n_videos} videos "
                f"diverged; |dF| mean {np.mean(self.abs_df):.4f} "
                f"max {np.max(self.abs_df):.4f}")


def evaluate(model, variables, val_records: List, nms_thresh: float,
             batch_size: int = 4, bucket_size: int = 64,
             knapsack_audit: "KnapsackAudit | None" = None):
    """F-score + diversity over a list of VideoRecords. (evaluate.py:14-40)"""
    stats = AverageMeter("fscore", "diversity")
    num_scales = getattr(model, "anchor_scales", None)
    if num_scales is not None:
        from edsnet_tpu.ops.anchors import anchor_scales_list
        num_scales = len(anchor_scales_list(num_scales))
    else:
        num_scales = 1

    from edsnet_tpu.parallel.eval_device import model_needs_motion
    for batch in batching.batch_eval_records(val_records, batch_size,
                                             bucket_size,
                                             need_motion=model_needs_motion(model)):
        lens = np.asarray([r.seq.shape[0] for r in batch["records"]]
                          + [0] * (batch["seq"].shape[0]
                                   - len(batch["records"])), np.int32)
        motion = batch.get("motion")
        pred_cls, boxes, keeps = _predict_nms(
            model, variables, jnp.asarray(batch["seq"]),
            jnp.asarray(batch["mask"]), jnp.asarray(lens), num_scales,
            nms_thresh,
            motion=None if motion is None else jnp.asarray(motion),
            motion_mask=None if motion is None
            else jnp.asarray(batch["motion_mask"]))
        pred_cls = np.asarray(pred_cls)
        boxes = np.asarray(boxes)
        keeps = np.asarray(keeps)

        for i, record in enumerate(batch["records"]):
            seq_len = record.seq.shape[0]
            keep_idx = np.where(keeps[i])[0]
            order = np.argsort(pred_cls[i][keep_idx], kind="stable")[::-1]
            keep_idx = keep_idx[order]
            kept_cls = pred_cls[i][keep_idx]
            kept_boxes = boxes[i][keep_idx].round().astype(np.int32)

            pred_summ = summ_ops.bbox2summary(
                seq_len, kept_cls, kept_boxes, record.cps, record.n_frames,
                record.nfps, record.picks)

            eval_metric = "avg" if "tvsum" in record.key else "max"
            if knapsack_audit is not None:
                knapsack_audit.check(record, kept_cls, kept_boxes,
                                     eval_metric, pred_summ)
            fscore = summ_ops.get_summ_f1score(
                pred_summ, record.user_summary, eval_metric)
            down = summ_ops.downsample_summ(pred_summ)[:seq_len]
            if down.size < seq_len:
                down = np.pad(down, (0, seq_len - down.size))
            diversity = summ_ops.get_summ_diversity(down, record.seq)
            stats.update(fscore=fscore, diversity=diversity)

    return stats.fscore, stats.diversity


def evaluate_loader(model, variables, val_loader: DataLoader,
                    nms_thresh: float, **kwargs):
    records = list(iter(val_loader))
    return evaluate(model, variables, records, nms_thresh, **kwargs)


def main(argv=None):
    args = config_lib.get_arguments(argv)
    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(args.device, matmul_precision=getattr(args, 'matmul_precision', None))
    if getattr(args, "use_pallas", None) is not None:
        from edsnet_tpu.models.base import set_use_pallas
        set_use_pallas(args.use_pallas)
    if getattr(args, "context_parallel", 0):
        from edsnet_tpu.models.base import configure_context_parallel
        configure_context_parallel(args.context_parallel,
                                   getattr(args, "cp_min_len", 1024))
    config_lib.init_logger(args.model_dir, args.log_file)
    config_lib.set_random_seed(args.seed)
    logger.info(vars(args))

    model = get_model(args.model, **vars(args))

    for split_path in args.splits:
        split_path = Path(split_path)
        splits = load_yaml(split_path)
        stats = AverageMeter("fscore", "diversity")

        for split_idx, split in enumerate(splits):
            audit = None
            eval_fn = None  # default: the jitted device evaluator
            eval_kwargs = {}
            if getattr(args, "knapsack_audit", False):
                # the audit compares host solvers, so it rides the host path
                audit = KnapsackAudit()
                eval_fn = evaluate
                eval_kwargs["knapsack_audit"] = audit
            elif getattr(args, "host_eval", False):
                eval_fn = evaluate
            fscore, diversity = eval_fold_from_checkpoint(
                args, model, split_path, split_idx, split["test_keys"],
                eval_fn=eval_fn, **eval_kwargs)
            if audit is not None:
                msg = audit.report()
                logger.info(msg)
                print(msg)
            stats.update(fscore=fscore, diversity=diversity)
            msg = (f"{split_path.stem} split {split_idx}: diversity: "
                   f"{diversity:.4f}, F-score: {fscore:.4f}")
            logger.info(msg)
            print(msg)

        msg = (f"{split_path.stem}: diversity: {stats.diversity:.4f}, "
               f"F-score: {stats.fscore:.4f}")
        logger.info(msg)
        print(msg)


def eval_fold_from_checkpoint(args, model, split_path, fold_idx: int,
                              test_keys, eval_fn=None, **eval_kwargs):
    """Restore one fold's best checkpoint and evaluate it on its test
    keys -> ``(fscore, diversity)``.

    The single home of the restore-template + device-eval sequence:
    ``main`` and ``sweep.eval_diversity`` both ride it, so a change to
    checkpoint naming, restore templates, or the evaluator signature
    happens once.  ``eval_fn=None`` selects the jitted device evaluator;
    ``main``'s audit/host debug paths pass the host ``evaluate``.
    """
    ckpt_path = get_ckpt_path(args.model_dir, split_path, fold_idx)
    variables = ckpt_lib.load_checkpoint(
        model, ckpt_path, example_input=_example_input(args, model))
    val_set = VideoDataset(test_keys, args.data_root)
    records = [val_set[i] for i in range(len(val_set))]
    from edsnet_tpu.parallel.eval_device import (checkpoint_motion_width,
                                                 model_needs_motion)
    if model_needs_motion(model):
        # fail with a clear message instead of an opaque XLA dot error
        # when the h5's motion width differs from the checkpoint's
        widths = {r.motion_features.shape[-1] for r in records
                  if r.motion_features is not None}
        w_ckpt = checkpoint_motion_width(variables)
        if widths and widths != {w_ckpt}:
            raise ValueError(
                f"h5 motion_features are {sorted(widths)}-wide but the "
                f"checkpoint's cross-attention expects width {w_ckpt}")
    if eval_fn is None:
        from edsnet_tpu.parallel import make_mesh
        from edsnet_tpu.parallel.eval_device import evaluate_on_device
        eval_fn = evaluate_on_device
        # shard eval rows over the data mesh (all devices unless
        # --num-devices caps it); padding rows are masked exactly, so a
        # 1-device mesh reproduces the unsharded result bit-for-bit
        eval_kwargs = {**eval_kwargs,
                       "mesh": make_mesh(getattr(args, "num_devices", 0)
                                         or 0)}
    return eval_fn(model, variables, records, args.nms_thresh,
                   batch_size=max(args.batch_size, 1),
                   bucket_size=args.bucket_size, **eval_kwargs)


def _example_input(args, model):
    """Template inputs for checkpoint restore; must match the model's
    ``__call__`` signature.  Motion models (--model-depth cross-attention)
    take ``(seq, motion, mask, motion_mask)`` — see
    ``DSNetMotionFeatures.__call__`` — so building only ``(seq, mask)``
    would land the mask in the motion slot (the reference CLI serves every
    registry model, src/evaluate.py:43-63)."""
    from edsnet_tpu.parallel.eval_device import model_needs_motion
    n = args.bucket_size
    seq = jnp.zeros((1, n, args.num_feature), jnp.float32)
    mask = jnp.ones((1, n), bool)
    if model_needs_motion(model):
        # the template's motion width only shapes a throwaway init;
        # flax from_bytes restores the CHECKPOINT's own array shapes
        # (structure match is what matters, and the cross-attention
        # module tree is width-independent) — so a non-1024 motion
        # checkpoint restores fine (pinned by
        # test_evaluate_cli_motion_roundtrip_nonstandard_width)
        motion = jnp.zeros((1, n, 1024), jnp.float32)
        return (seq, motion, mask, mask)
    return (seq, mask)


if __name__ == "__main__":
    main()
