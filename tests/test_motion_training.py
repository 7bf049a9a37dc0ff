"""Cross-attention (motion-features) head trains end-to-end."""
import numpy as np
import yaml


def test_train_cross_attention(tmp_path):
    import h5py
    from edsnet_tpu.train import main

    rng = np.random.RandomState(0)
    h5_path = tmp_path / "mock_tvsum.h5"
    with h5py.File(h5_path, "w") as f:
        for i, n_seq in enumerate([20, 24, 28]):
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, 1024).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, -1, keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            b = np.linspace(0, n_frames, 11, dtype=np.int32)
            g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
            g["n_frame_per_seg"] = b[1:] - b[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(2, n_frames) > 0.8).astype(
                np.float32)
            g["motion_features"] = rng.randn(n_seq, 1024).astype(np.float32)
    keys = [f"d/mock_tvsum.h5/video_{i}" for i in range(3)]
    split_path = tmp_path / "mock.yml"
    with open(split_path, "w") as f:
        yaml.dump([{"train_keys": keys[:2], "test_keys": keys[2:]}], f)

    main(["anchor-based", "--model-depth", "cross-attention",
          "--base-model", "attention",
          "--splits", str(split_path), "--data-root", str(tmp_path),
          "--model-dir", str(tmp_path / "m"), "--max-epoch", "1",
          "--num-feature", "1024", "--num-hidden", "8", "--fc-depth", "1",
          "--attention-depth", "1", "--num-head", "2",
          "--bucket-size", "32", "--batch-size", "2",
          "--anchor-scales", "4"])

    results = yaml.safe_load((tmp_path / "m" / "mock.yml").read_text())
    assert 0.0 <= results["mean"] <= 1.0
