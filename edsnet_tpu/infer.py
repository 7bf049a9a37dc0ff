"""Inference CLI: raw MP4 -> features -> KTS -> predict -> summary video.

Reference: `src/infer.py` (whose HEAD misses the required feature_extractor
argument at infer.py:22 — fixed via --feature-extractor).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from edsnet_tpu import config as config_lib
from edsnet_tpu.data.video import VideoPreprocessor
from edsnet_tpu.models.model_zoo import get_model

from edsnet_tpu.ops import summary as summ_ops
from edsnet_tpu.utils import checkpoint as ckpt_lib


def summarize_video(model, variables, seq: np.ndarray, cps, n_frames, nfps,
                    picks, nms_thresh: float, bucket_size: int = 64,
                    motion: np.ndarray | None = None) -> np.ndarray:
    """features -> binary frame summary (shared by infer + tests).

    The sequence is padded to a length bucket and predict + NMS run through
    the same jitted bucketed program as evaluation, so videos of different
    lengths share one XLA compile per bucket (per-exact-length compiles are
    pathological on a remote-compile platform).  ``motion`` (aligned
    [seq_len, D] rows) is required iff the model consumes motion features.
    """
    from edsnet_tpu.evaluate import _predict_nms
    from edsnet_tpu.ops.anchors import anchor_scales_list

    seq_len = len(seq)
    blen = max(bucket_size, -(-seq_len // bucket_size) * bucket_size)
    x = np.zeros((1, blen, seq.shape[-1]), np.float32)
    x[0, :seq_len] = seq
    mask = (np.arange(blen) < seq_len)[None]
    scales = getattr(model, "anchor_scales", None)
    num_scales = len(anchor_scales_list(scales)) if scales is not None else 1

    motion_kw = {}
    if motion is not None:
        m = np.zeros((1, blen, motion.shape[-1]), np.float32)
        m[0, :seq_len] = motion[:seq_len]
        motion_kw = {"motion": jnp.asarray(m),
                     "motion_mask": jnp.asarray(mask)}

    pred_cls, boxes, keeps = _predict_nms(
        model, variables, jnp.asarray(x), jnp.asarray(mask),
        jnp.asarray([seq_len], np.int32), num_scales, nms_thresh,
        **motion_kw)
    pred_cls = np.asarray(pred_cls)[0]
    boxes = np.asarray(boxes)[0]
    keep_idx = np.where(np.asarray(keeps)[0])[0]
    order = np.argsort(pred_cls[keep_idx], kind="stable")[::-1]
    keep_idx = keep_idx[order]
    return summ_ops.bbox2summary(
        seq_len, pred_cls[keep_idx],
        boxes[keep_idx].round().astype(np.int32), cps, n_frames, nfps,
        picks)


def _load_motion(args, seq_len: int, width: int) -> np.ndarray:
    """Load (--motion-feature .npy) or extract (--motion-backend) motion
    features and validate them against the RESTORED checkpoint: exact
    feature width, and one row per sampled frame.

    Both checks fail loudly instead of silently mis-serving: a dump made
    at a different --sample-rate would otherwise be truncated to motion
    from the wrong timestamps, and a width mismatch would surface only as
    an opaque XLA dot-dimension error.  A <=2-row tail surplus is
    tolerated (codecs can report a few more frames than cv2 decodes).
    """
    if args.motion_feature:
        motion = np.load(args.motion_feature).astype(np.float32)
        source = args.motion_feature
    else:
        from edsnet_tpu.data.motion import extract_motion_features
        if width != 1024:
            raise ValueError(
                f"the checkpoint's cross-attention expects {width}-wide "
                f"motion features but the on-the-fly "
                f"{args.motion_backend} extractor emits 1024 — pass a "
                f"--motion-feature .npy of the right width")
        print(f"Extracting motion features ({args.motion_backend}) ...")
        motion = extract_motion_features(
            args.source, sample_rate=args.sample_rate,
            backend=args.motion_backend)
        source = f"--motion-backend {args.motion_backend}"
    if motion.ndim != 2 or motion.shape[-1] != width:
        raise ValueError(
            f"motion features from {source} have shape "
            f"{tuple(motion.shape)} but the checkpoint's cross-attention "
            f"expects width {width}")
    if not seq_len <= len(motion) <= seq_len + 2:
        raise ValueError(
            f"motion features cover {len(motion)} sampled frames but the "
            f"video has {seq_len} — regenerate the .npy at "
            f"--sample-rate {args.sample_rate}")
    return motion[:seq_len]


def main():
    import cv2

    args = config_lib.get_arguments()
    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(args.device, matmul_precision=getattr(args, 'matmul_precision', None))
    if getattr(args, "use_pallas", None) is not None:
        from edsnet_tpu.models.base import set_use_pallas
        set_use_pallas(args.use_pallas)
    if getattr(args, "context_parallel", 0):
        from edsnet_tpu.models.base import configure_context_parallel
        configure_context_parallel(args.context_parallel,
                                   getattr(args, "cp_min_len", 1024))

    print("Loading model ...")
    model = get_model(args.model, **vars(args))

    from edsnet_tpu.parallel.eval_device import (checkpoint_motion_width,
                                                 model_needs_motion)
    needs_motion = model_needs_motion(model)
    if args.motion_feature and not needs_motion:
        raise ValueError(
            "--motion-feature given but the model is not a motion "
            "(cross-attention) model — did you forget "
            "--model-depth cross-attention?")

    print("Preprocessing source video ...")
    video_proc = VideoPreprocessor(args.sample_rate, args.feature_extractor,
                                   device_kts=getattr(args, "device_kts",
                                                      False))
    n_frames, seq, cps, nfps, picks = video_proc.run(args.source)

    seq_tpl = jnp.zeros((1, args.bucket_size, args.num_feature),
                        jnp.float32)
    mask_tpl = jnp.ones((1, args.bucket_size), bool)
    if needs_motion:
        # the template's motion width only shapes a throwaway init; flax
        # from_bytes restores the CHECKPOINT's own array shapes (pinned
        # by test_evaluate_cli_motion_roundtrip_nonstandard_width)
        example = (seq_tpl,
                   jnp.zeros((1, args.bucket_size, 1024), jnp.float32),
                   mask_tpl, mask_tpl)
    else:
        example = (seq_tpl, mask_tpl)
    variables = ckpt_lib.load_checkpoint(model, args.ckpt_path,
                                         example_input=example)

    motion = None
    if needs_motion:
        # motion models (--model-depth cross-attention) need one motion
        # row per sampled frame; the reference CLI cannot serve them at
        # all (src/infer.py:14 builds the model but its forward takes
        # only one input).  Load a precomputed dump or compute one with
        # the same extractor make_dataset's .npy dumps come from.
        motion = _load_motion(args, len(seq),
                              checkpoint_motion_width(variables))

    print("Predicting summary ...")
    pred_summ = summarize_video(model, variables, seq, cps, n_frames, nfps,
                                picks, args.nms_thresh,
                                bucket_size=args.bucket_size, motion=motion)

    print("Writing summary video ...")
    cap = cv2.VideoCapture(args.source)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS)

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(args.save_path, fourcc, fps, (width, height))

    frame_idx = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if frame_idx < len(pred_summ) and pred_summ[frame_idx]:
            out.write(frame)
        frame_idx += 1

    out.release()
    cap.release()


if __name__ == "__main__":
    main()
