"""End-to-end training integration test on a synthetic h5 dataset.

Mirrors the reference tests/test_train.py strategy (fabricated consistent
videos + 2-epoch CPU run through the full CLI main), using a real temporary
h5 file instead of monkeypatched h5py.
"""
from pathlib import Path

import h5py
import numpy as np
import pytest
import yaml

FEAT = 32


def _write_video(h5, name, n_seq, rng):
    n_frames = n_seq * 15
    features = rng.randn(n_seq, FEAT).astype(np.float32)
    features /= np.linalg.norm(features, axis=-1, keepdims=True)
    gtscore = rng.rand(n_seq).astype(np.float32)
    picks = np.arange(n_seq, dtype=np.int32) * 15
    # 10 shots so several fit inside the 15% knapsack budget
    bounds = np.linspace(0, n_frames, 11, dtype=np.int32)
    cps = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
    nfps = bounds[1:] - bounds[:-1]
    user_summary = (rng.rand(3, n_frames) > 0.8).astype(np.float32)
    g = h5.create_group(name)
    g.create_dataset("features", data=features)
    g.create_dataset("gtscore", data=gtscore)
    g.create_dataset("change_points", data=cps)
    g.create_dataset("n_frames", data=n_frames)
    g.create_dataset("n_frame_per_seg", data=nfps)
    g.create_dataset("picks", data=picks)
    g.create_dataset("user_summary", data=user_summary)


@pytest.fixture(scope="module")
def mock_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    h5_path = root / "mock_tvsum.h5"
    rng = np.random.RandomState(0)
    with h5py.File(h5_path, "w") as f:
        for i, n_seq in enumerate([20, 24, 20, 28]):
            _write_video(f, f"video_{i}", n_seq, rng)
    keys = [f"../datasets/mock_tvsum.h5/video_{i}" for i in range(4)]
    split_path = root / "mock.yml"
    with open(split_path, "w") as f:
        yaml.dump([{"train_keys": keys[:3], "test_keys": keys[3:]}], f)
    return root, split_path


def _common_args(root, split_path, model_dir):
    return [
        "--splits", str(split_path),
        "--data-root", str(root),
        "--model-dir", str(model_dir),
        "--max-epoch", "2",
        "--num-feature", str(FEAT),
        "--num-hidden", "8",
        "--fc-depth", "2",
        "--num-head", "2",
        "--bucket-size", "32",
        "--batch-size", "2",
        "--anchor-scales", "4", "8",
    ]


def test_train_anchor_based(mock_dataset, tmp_path):
    from edsnet_tpu.train import main
    root, split_path = mock_dataset
    model_dir = tmp_path / "model_ab"
    main(["anchor-based", "--base-model", "linear"]
         + _common_args(root, split_path, model_dir))

    assert (model_dir / "checkpoint" / "mock.yml.0.pt").exists()
    results = yaml.safe_load((model_dir / "mock.yml").read_text())
    assert 0.0 <= results["mean"] <= 1.0
    assert "split0" in results


def test_train_anchor_free(mock_dataset, tmp_path):
    from edsnet_tpu.train import main
    root, split_path = mock_dataset
    model_dir = tmp_path / "model_af"
    main(["anchor-free", "--base-model", "linear"]
         + _common_args(root, split_path, model_dir))
    assert (model_dir / "checkpoint" / "mock.yml.0.pt").exists()
    results = yaml.safe_load((model_dir / "mock.yml").read_text())
    assert 0.0 <= results["mean"] <= 1.0


def test_evaluate_cli_roundtrip(mock_dataset, tmp_path):
    """Checkpoint written by train must load and evaluate via evaluate.main."""
    from edsnet_tpu import evaluate as eval_mod
    from edsnet_tpu.train import main as train_main
    root, split_path = mock_dataset
    model_dir = tmp_path / "model_rt"
    argv_tail = _common_args(root, split_path, model_dir)
    train_main(["anchor-based", "--base-model", "linear"] + argv_tail)

    import sys
    old = sys.argv
    try:
        sys.argv = ["evaluate.py", "anchor-based", "--base-model", "linear"] \
            + argv_tail
        eval_mod.main()
    finally:
        sys.argv = old
