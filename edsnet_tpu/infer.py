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
from edsnet_tpu.ops import bbox as bbox_ops
from edsnet_tpu.ops import summary as summ_ops
from edsnet_tpu.utils import checkpoint as ckpt_lib


def summarize_video(model, variables, seq: np.ndarray, cps, n_frames, nfps,
                    picks, nms_thresh: float) -> np.ndarray:
    """features -> binary frame summary (shared by infer + tests)."""
    seq_len = len(seq)
    x = jnp.asarray(seq, jnp.float32)[None]
    mask = jnp.ones((1, seq_len), bool)
    pred_cls, pred_boxes = model.apply(variables, x, mask, method="predict")
    pred_cls = np.asarray(pred_cls)[0]
    pred_boxes = np.asarray(pred_boxes)[0]

    pred_boxes = np.clip(pred_boxes, 0, seq_len).round().astype(np.int32)
    pred_cls, pred_boxes = bbox_ops.nms(pred_cls, pred_boxes, nms_thresh)
    return summ_ops.bbox2summary(seq_len, pred_cls, pred_boxes, cps,
                                 n_frames, nfps, picks)


def main():
    import cv2

    args = config_lib.get_arguments()
    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(args.device, matmul_precision=getattr(args, 'matmul_precision', None))

    print("Loading model ...")
    model = get_model(args.model, **vars(args))

    print("Preprocessing source video ...")
    video_proc = VideoPreprocessor(args.sample_rate, args.feature_extractor)
    n_frames, seq, cps, nfps, picks = video_proc.run(args.source)

    variables = ckpt_lib.load_checkpoint(
        model, args.ckpt_path,
        example_input=(jnp.zeros((1, len(seq), args.num_feature),
                                 jnp.float32),
                       jnp.ones((1, len(seq)), bool)))

    print("Predicting summary ...")
    pred_summ = summarize_video(model, variables, seq, cps, n_frames, nfps,
                                picks, args.nms_thresh)

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
