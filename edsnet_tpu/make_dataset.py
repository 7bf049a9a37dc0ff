"""Dataset builder: videos + user-summary JSONs -> eccv16-format h5.

Reference: `src/make_dataset.py` (incl. the +-5-frame label/video length
trim tolerance at make_dataset.py:63-74 — implemented so that trimming
actually keeps the video, instead of the reference's `continue` which
discards it after trimming; and the feature trim fixed to the time axis,
reference trims axis 1 of an (N, 1024) array).
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import h5py
import numpy as np

from edsnet_tpu.data.video import VideoPreprocessor


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--video-dir", type=str,
                        default="../custom_data/videos/")
    parser.add_argument("--label-dir", type=str,
                        default="../custom_data/labels/")
    parser.add_argument("--sample-rate", type=int, default=15)
    parser.add_argument("--save-path", type=str,
                        default="../custom_data/custom_dataset.h5")
    parser.add_argument("--feature-extractor", type=str, default="google-net",
                        choices=["google-net", "swin-transformer", "convnext",
                                 "random"])
    parser.add_argument("--motion-feature", type=str, default=None)
    args = parser.parse_args(argv)

    out_dir = Path(args.save_path).parent
    out_dir.mkdir(parents=True, exist_ok=True)
    label_dir = Path(args.label_dir)

    print("Loading feature extractor ...")
    video_proc = VideoPreprocessor(args.sample_rate, args.feature_extractor)

    video_list = sorted(os.listdir(args.video_dir))
    video_paths = [os.path.join(args.video_dir, v) for v in video_list
                   if v.endswith(".mp4")]

    motion_paths = []
    if args.motion_feature is not None:
        motion_list = sorted(os.listdir(args.motion_feature))
        motion_paths = [os.path.join(args.motion_feature, m)
                        for m in motion_list if m.endswith(".npy")]

    print(f"Processing {len(video_paths)} videos ...")
    with h5py.File(args.save_path, "w") as h5out:
        for idx, video_path in enumerate(video_paths):
            n_frames, features, cps, nfps, picks = video_proc.run(video_path)

            video_name = Path(video_path).name.split(".")[0]
            label_path = label_dir / f"{video_name}.json"
            with open(label_path) as f:
                data = json.load(f)
            user_summary = np.array(data["user_summary"], dtype=np.float32)
            _, label_n_frames = user_summary.shape

            if n_frames != label_n_frames:
                if abs(n_frames - label_n_frames) < 5:
                    print(f"{video_name}: trimming to "
                          f"min({n_frames}, {label_n_frames}) frames")
                    if n_frames > label_n_frames:
                        n_frames = label_n_frames
                        keep = picks < n_frames
                        features = features[keep]
                        picks = picks[keep]
                        cps = np.clip(cps, 0, n_frames - 1)
                        nfps = cps[:, 1] - cps[:, 0] + 1
                    else:
                        user_summary = user_summary[:, :n_frames]
                else:
                    print(f"Invalid label of size {label_n_frames}: "
                          f"expected {n_frames}; skipping {video_name}")
                    continue

            gtscore = np.mean(user_summary[:, ::args.sample_rate], axis=0)
            gtscore = gtscore[:len(picks)]

            key = video_name
            h5out.create_dataset(f"{key}/features", data=features)
            h5out.create_dataset(f"{key}/gtscore", data=gtscore)
            h5out.create_dataset(f"{key}/user_summary", data=user_summary)
            h5out.create_dataset(f"{key}/change_points", data=cps)
            h5out.create_dataset(f"{key}/n_frame_per_seg", data=nfps)
            h5out.create_dataset(f"{key}/n_frames", data=n_frames)
            h5out.create_dataset(f"{key}/picks", data=picks)
            h5out.create_dataset(f"{key}/video_name", data=video_name)

            if motion_paths:
                motion = np.load(motion_paths[idx])[::args.sample_rate]
                h5out.create_dataset(f"{key}/motion_features", data=motion)

    print(f"Dataset saved to {args.save_path}")


if __name__ == "__main__":
    main()
