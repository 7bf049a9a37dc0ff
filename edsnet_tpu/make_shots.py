"""Shot maker: regenerate KTS change points / nfps / picks for an h5.

Reference: `src/make_shots.py` (used for the OVP & YouTube datasets whose
shipped change points use a different convention).
"""
from __future__ import annotations

import argparse

import h5py
import numpy as np

from edsnet_tpu.ops.kts import cpd_auto


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--sample-rate", type=int, default=15)
    args = parser.parse_args(argv)

    sr = args.sample_rate
    with h5py.File(args.dataset, "r") as h5in, \
            h5py.File(args.dataset + ".custom", "w") as h5out:
        for video_name, video_file in h5in.items():
            features = video_file["features"][...].astype(np.float32)
            gtscore = video_file["gtscore"][...].astype(np.float32)

            seq_len = gtscore.size
            n_frames = seq_len * sr - 1
            picks = np.arange(0, seq_len) * sr

            kernel = np.matmul(features, features.T)
            change_points, _ = cpd_auto(kernel, seq_len - 1, 1)
            change_points = change_points * sr
            change_points = np.hstack((0, change_points, n_frames))
            begin_frames = change_points[:-1]
            end_frames = change_points[1:]
            change_points = np.vstack((begin_frames, end_frames - 1)).T
            n_frame_per_seg = end_frames - begin_frames

            h5out.create_dataset(video_name + "/features", data=features)
            h5out.create_dataset(video_name + "/gtscore", data=gtscore)
            h5out.create_dataset(video_name + "/change_points",
                                 data=change_points)
            h5out.create_dataset(video_name + "/n_frame_per_seg",
                                 data=n_frame_per_seg)
            h5out.create_dataset(video_name + "/n_frames", data=n_frames)
            h5out.create_dataset(video_name + "/picks", data=picks)
            if "gtsummary" in video_file:
                h5out.create_dataset(
                    video_name + "/gtsummary",
                    data=video_file["gtsummary"][...].astype(np.float32))
            if "user_summary" in video_file:
                h5out.create_dataset(
                    video_name + "/user_summary",
                    data=video_file["user_summary"][...].astype(np.float32))


if __name__ == "__main__":
    main()
