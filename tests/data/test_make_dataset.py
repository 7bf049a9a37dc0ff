"""make_dataset e2e: synthetic mp4s + label JSONs -> eccv16-format h5."""
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_mp4(path, n_frames=150):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, 30.0, (64, 64))
    rng = np.random.RandomState(0)
    base = np.zeros((64, 64, 3), np.uint8)
    base[:32] = 200
    for i in range(n_frames):
        if i == n_frames // 2:
            base = np.zeros((64, 64, 3), np.uint8)
            base[:, :32] = 200
        frame = np.clip(base.astype(np.int32)
                        + rng.randint(-8, 8, base.shape), 0,
                        255).astype(np.uint8)
        out.write(frame)
    out.release()
    return n_frames


def test_make_dataset(tmp_path):
    import h5py
    from edsnet_tpu.make_dataset import main

    video_dir = tmp_path / "videos"
    label_dir = tmp_path / "labels"
    video_dir.mkdir()
    label_dir.mkdir()

    n_frames = _write_mp4(video_dir / "clip_a.mp4")
    user_summary = (np.random.RandomState(1).rand(3, n_frames) > 0.8)
    (label_dir / "clip_a.json").write_text(
        json.dumps({"user_summary": user_summary.astype(int).tolist()}))

    save_path = tmp_path / "out.h5"
    main(["--video-dir", str(video_dir), "--label-dir", str(label_dir),
          "--save-path", str(save_path), "--feature-extractor", "random"])

    with h5py.File(save_path, "r") as f:
        g = f["clip_a"]
        n_seq = (n_frames + 14) // 15
        assert g["features"].shape == (n_seq, 1024)
        assert g["gtscore"].shape == (n_seq,)
        assert g["user_summary"].shape == (3, n_frames)
        cps = g["change_points"][...]
        nfps = g["n_frame_per_seg"][...]
        assert cps[0, 0] == 0 and cps[-1, 1] == n_frames - 1
        assert (nfps == cps[:, 1] - cps[:, 0] + 1).all()
        assert (g["picks"][...] == np.arange(n_seq) * 15).all()


def test_make_dataset_trim_tolerance(tmp_path):
    """Label 3 frames shorter than the video: trims and keeps the video."""
    import h5py
    from edsnet_tpu.make_dataset import main

    video_dir = tmp_path / "videos"
    label_dir = tmp_path / "labels"
    video_dir.mkdir()
    label_dir.mkdir()

    n_frames = _write_mp4(video_dir / "clip_b.mp4", n_frames=150)
    short = n_frames - 3
    user_summary = (np.random.RandomState(2).rand(2, short) > 0.8)
    (label_dir / "clip_b.json").write_text(
        json.dumps({"user_summary": user_summary.astype(int).tolist()}))

    save_path = tmp_path / "out.h5"
    main(["--video-dir", str(video_dir), "--label-dir", str(label_dir),
          "--save-path", str(save_path), "--feature-extractor", "random"])

    with h5py.File(save_path, "r") as f:
        assert "clip_b" in f
        g = f["clip_b"]
        assert int(g["n_frames"][...]) == short
        assert g["user_summary"].shape[1] == short
        assert g["features"].shape[0] == g["gtscore"].shape[0] \
            == g["picks"].shape[0]
