"""Full train CLI on the 8-virtual-device mesh: epochs, eval, checkpoint,
uneven final batch, and F-score parity with a 1-device run.

The conftest forces an 8-device CPU platform; ``--pad-batch-to 8`` keeps
batch shapes (hence dropout / negative-sampling RNG streams) identical
across mesh sizes, so the two runs execute the same numerical program and
must land on the same best F-score.
"""
from pathlib import Path

import h5py
import numpy as np
import pytest
import yaml

FEAT = 16
N_TRAIN = 9   # batch_size 4 -> final batch of 1, padded to 8 dummy rows


@pytest.fixture(scope="module")
def pipeline_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mcdata")
    h5_path = root / "mock_tvsum.h5"
    rng = np.random.RandomState(7)
    n_total = N_TRAIN + 2
    with h5py.File(h5_path, "w") as f:
        for i in range(n_total):
            n_seq = int(rng.choice([18, 22, 26]))
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, FEAT).astype(np.float32)
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
    keys = [f"../d/mock_tvsum.h5/video_{i}" for i in range(n_total)]
    split_path = root / "mc.yml"
    split_path.write_text(yaml.dump(
        [{"train_keys": keys[:N_TRAIN], "test_keys": keys[N_TRAIN:]}]))
    return root, split_path


def _run(root, split_path, model_dir, num_devices):
    from edsnet_tpu.train import main
    main(["anchor-based", "--base-model", "linear",
          "--splits", str(split_path),
          "--data-root", str(root),
          "--model-dir", str(model_dir),
          "--max-epoch", "2",
          "--num-feature", str(FEAT),
          "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
          "--bucket-size", "32", "--batch-size", "4",
          "--anchor-scales", "4", "8",
          "--num-devices", str(num_devices),
          "--pad-batch-to", "8"])
    results = yaml.safe_load((Path(model_dir) / "mc.yml").read_text())
    return results


def test_full_train_cli_on_8_device_mesh(pipeline_dataset, tmp_path):
    root, split_path = pipeline_dataset
    res8 = _run(root, split_path, tmp_path / "m8", num_devices=8)
    assert (tmp_path / "m8" / "checkpoint" / "mc.yml.0.pt").exists()
    assert 0.0 <= res8["mean"] <= 1.0

    res1 = _run(root, split_path, tmp_path / "m1", num_devices=1)
    # same shapes + same seeds => same numerical program; sharded vs
    # single-device reduction order is the only difference
    assert abs(res8["mean"] - res1["mean"]) < 1e-4, (res8, res1)


def test_multichip_checkpoint_evaluates_on_one_device(pipeline_dataset,
                                                      tmp_path, capsys):
    """A checkpoint trained on the 8-device mesh must evaluate identically
    through the (1-device) evaluate CLI."""
    from edsnet_tpu.evaluate import main as eval_main
    root, split_path = pipeline_dataset
    model_dir = tmp_path / "m8e"
    res8 = _run(root, split_path, model_dir, num_devices=8)

    eval_main(["anchor-based", "--base-model", "linear",
               "--splits", str(split_path),
               "--data-root", str(root),
               "--model-dir", str(model_dir),
               "--num-feature", str(FEAT),
               "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
               "--bucket-size", "32", "--batch-size", "4",
               "--anchor-scales", "4", "8",
               "--num-devices", "1"])
    out = capsys.readouterr().out
    assert f"F-score: {res8['split0']:.4f}" in out, (res8, out)
