"""Paper-sweep runner end-to-end on synthetic data.

Builds a mini splits-dir + datasets mimicking the reference layout
(canonical tvsum + an aug variant whose datasets are missing) and checks
the runner trains the reachable settings, skips the unreachable ones, and
writes the results JSON.
"""
import json

import h5py
import numpy as np
import yaml


def _dataset(path, n_videos, feat, rng):
    with h5py.File(path, "w") as f:
        for i in range(n_videos):
            n_seq = int(rng.choice([18, 24]))
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, feat).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, axis=-1,
                                                   keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            bounds = np.linspace(0, n_frames, 11, dtype=np.int32)
            g["change_points"] = np.stack([bounds[:-1], bounds[1:] - 1], 1)
            g["n_frame_per_seg"] = bounds[1:] - bounds[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(3, n_frames) > 0.8).astype(
                np.float32)


def test_sweep_runner_end_to_end(tmp_path):
    from edsnet_tpu.sweep import run_sweep

    feat = 16
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "datasets"
    data_dir.mkdir()
    _dataset(data_dir / "eccv16_dataset_tvsum_google_pool5.h5", 6, feat,
             rng)

    splits_dir = tmp_path / "splits"
    splits_dir.mkdir()
    keys = [f"../datasets/eccv16_dataset_tvsum_google_pool5.h5/video_{i}"
            for i in range(6)]
    (splits_dir / "tvsum.yml").write_text(yaml.dump(
        [{"train_keys": keys[:4], "test_keys": keys[4:]}]))
    # aug split references a dataset that does NOT exist locally
    aug_keys = keys[:4] + [
        "../datasets/eccv16_dataset_ovp_google_pool5.h5/video_0"]
    (splits_dir / "tvsum_aug.yml").write_text(yaml.dump(
        [{"train_keys": aug_keys, "test_keys": keys[4:]}]))

    out_path = tmp_path / "report.json"
    report = run_sweep([
        "--data-root", str(data_dir),
        "--splits-dir", str(splits_dir),
        "--output", str(out_path),
        "--model-root", str(tmp_path / "models"),
        "--settings", "canonical", "aug",
        "--max-epoch", "2",
        "--extra", "--base-model", "linear", "--num-feature", str(feat),
        "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
        "--bucket-size", "32", "--anchor-scales", "4"])

    saved = json.loads(out_path.read_text())
    assert saved == report
    tvsum = report["settings"]["canonical"]["tvsum"]
    assert tvsum["status"] == "ok"
    assert 0.0 <= tvsum["fscores"]["mean"] <= 1.0
    assert (tmp_path / "models" / "canonical" / "tvsum" / "checkpoint"
            / "tvsum.yml.0.pt").exists()
    # summe.yml absent from the mini splits dir -> reported as missing
    assert "missing split file" in \
        report["settings"]["canonical"]["summe"]["status"]
    aug = report["settings"]["aug"]["tvsum_aug"]
    assert aug["status"] == "missing datasets"
    assert "eccv16_dataset_ovp_google_pool5.h5" in aug["missing"]
