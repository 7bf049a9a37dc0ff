"""CLI tool coverage: make_split, make_shots, model_info, kts_demo, config."""
import numpy as np
import yaml


def _tiny_h5(tmp_path, n_videos=5):
    import h5py
    rng = np.random.RandomState(0)
    path = tmp_path / "ds.h5"
    with h5py.File(path, "w") as f:
        for i in range(n_videos):
            n_seq = 16 + i
            g = f.create_group(f"video_{i}")
            g["features"] = rng.randn(n_seq, 8).astype(np.float32)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            b = np.linspace(0, n_seq * 15, 5, dtype=np.int32)
            g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
            g["n_frame_per_seg"] = b[1:] - b[:-1]
            g["n_frames"] = n_seq * 15
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
    return path


def test_make_split_random_and_cross(tmp_path):
    from edsnet_tpu.make_split import main
    ds = _tiny_h5(tmp_path)
    out = tmp_path / "splits.yml"
    main(["--dataset", str(ds), "--save-path", str(out),
          "--num-splits", "3", "--seed", "1"])
    splits = yaml.safe_load(out.read_text())
    assert len(splits) == 3
    for s in splits:
        assert len(s["train_keys"]) == 4 and len(s["test_keys"]) == 1
        assert not set(s["train_keys"]) & set(s["test_keys"])

    main(["--dataset", str(ds), "--save-path", str(out), "--method", "cross",
          "--seed", "1"])
    splits = yaml.safe_load(out.read_text())
    assert len(splits) == 5  # leave-one-out with 5 videos, 20% test


def test_make_split_extra_datasets(tmp_path):
    from edsnet_tpu.make_split import main
    ds = _tiny_h5(tmp_path)
    extra_dir = tmp_path / "extra"
    extra_dir.mkdir()
    extra = _tiny_h5(extra_dir, n_videos=3)
    out = tmp_path / "aug.yml"
    main(["--dataset", str(ds), "--extra-datasets", str(extra),
          "--save-path", str(out), "--num-splits", "1", "--seed", "0"])
    splits = yaml.safe_load(out.read_text())
    # aug setting: extra keys appended to train only
    assert len(splits[0]["train_keys"]) == 4 + 3
    assert len(splits[0]["test_keys"]) == 1


def test_make_shots(tmp_path):
    import h5py
    from edsnet_tpu.make_shots import main
    ds = _tiny_h5(tmp_path)
    main(["--dataset", str(ds)])
    with h5py.File(str(ds) + ".custom", "r") as f:
        v = f["video_0"]
        cps = v["change_points"][...]
        nfps = v["n_frame_per_seg"][...]
        assert cps[0, 0] == 0
        assert (nfps == cps[:, 1] - cps[:, 0] + 1).all()
        assert int(v["n_frames"][...]) == 16 * 15 - 1


def test_model_info_cli(capsys):
    from edsnet_tpu.model_info import main
    main(["anchor-based", "--num-feature", "32", "--num-hidden", "8",
          "--num-head", "2", "--fc-depth", "1", "--base-model", "linear",
          "--anchor-scales", "4"])
    out = capsys.readouterr().out
    assert "total:" in out


def test_kts_demo(capsys):
    from edsnet_tpu.kts_demo import main
    main()
    out = capsys.readouterr().out
    assert "cpd_nonlin" in out


def test_config_defaults():
    from edsnet_tpu.config import get_arguments
    a = get_arguments(["anchor-based"])
    assert a.lr == 5e-5 and a.weight_decay == 1e-5
    assert a.anchor_scales == [4, 8, 16, 32]
    assert a.max_epoch == 300 and a.fc_depth == 7
    assert a.orientation == "paper"
    a2 = get_arguments(["anchor-free", "--fft-attention-orientation",
                        "temporal"])
    assert a2.orientation == "temporal"
