"""Real-data readiness drill: the full canonical paper matrix end-to-end.

The published result this framework must reproduce is the canonical
TVSum/SumMe F-score table (reference README.md:47-48, split files at
reference splits/{tvsum,summe}.yml).  No real eccv16 h5 exists on this
machine, so this drill proves the *mechanics* are one command away: it
reads the REAL canonical split yamls shipped in `splits/`, fabricates an
eccv16-schema h5 containing every video key those splits reference, and
drives `python -m edsnet_tpu.sweep` over the full 2-dataset x 5-fold
canonical matrix to a BASELINE-style results JSON.

When the real datasets land, the identical command (minus the tiny-dims
--extra flags) produces the paper-comparison artifact:

    python -m edsnet_tpu.sweep --data-root <datasets> --settings canonical
"""
import json
from pathlib import Path

import h5py
import numpy as np
import yaml

SPLITS_DIR = Path(__file__).resolve().parent.parent / "splits"
FEAT = 16


def _fabricate_eccv16_h5(path, video_keys, rng):
    """Write an eccv16-schema h5 with exactly the referenced video groups
    (schema: reference src/helpers/data_helper.py:25-33)."""
    with h5py.File(path, "w") as f:
        for name in sorted(video_keys):
            n_seq = int(rng.choice([18, 22, 26]))
            n_frames = n_seq * 15
            g = f.create_group(name)
            feats = rng.randn(n_seq, FEAT).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, axis=-1,
                                                   keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            bounds = np.linspace(0, n_frames, 9, dtype=np.int32)
            g["change_points"] = np.stack([bounds[:-1], bounds[1:] - 1], 1)
            g["n_frame_per_seg"] = bounds[1:] - bounds[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(4, n_frames) > 0.85).astype(
                np.float32)


def _keys_by_dataset(split_path):
    """dataset-filename -> set of video names referenced by the split."""
    by_ds = {}
    for fold in yaml.safe_load(split_path.read_text()):
        for key in fold["train_keys"] + fold["test_keys"]:
            parts = Path(key)
            by_ds.setdefault(parts.parent.name, set()).add(parts.name)
    return by_ds


def test_canonical_paper_matrix_drill(tmp_path):
    """Full canonical sweep (tvsum + summe, all 5 folds each) against
    fabricated datasets resolved through the REAL split yamls."""
    from edsnet_tpu.sweep import run_sweep

    rng = np.random.RandomState(42)
    data_dir = tmp_path / "datasets"
    data_dir.mkdir()
    expected_folds = {}
    for split_name in ("tvsum.yml", "summe.yml"):
        split_path = SPLITS_DIR / split_name
        assert split_path.exists(), f"canonical split {split_name} missing"
        for ds_file, names in _keys_by_dataset(split_path).items():
            _fabricate_eccv16_h5(data_dir / ds_file, names, rng)
        expected_folds[split_path.stem] = len(
            yaml.safe_load(split_path.read_text()))

    out_path = tmp_path / "paper_sweep.json"
    report = run_sweep([
        "--data-root", str(data_dir),
        "--splits-dir", str(SPLITS_DIR),
        "--output", str(out_path),
        "--model-root", str(tmp_path / "models"),
        "--settings", "canonical",
        "--max-epoch", "1",
        # tiny dims so the drill is CI-speed; the real run drops --extra
        "--extra", "--base-model", "linear", "--num-feature", str(FEAT),
        "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
        "--bucket-size", "32", "--batch-size", "8", "--anchor-scales", "4"])

    saved = json.loads(out_path.read_text())
    assert saved == report
    canonical = report["settings"]["canonical"]
    assert set(canonical) == {"tvsum", "summe"}
    for stem, entry in canonical.items():
        assert entry["status"] == "ok", (stem, entry)
        fscores = entry["fscores"]
        # one F-score per fold + the mean, every value a valid F
        folds = [k for k in fscores if k.startswith("split")]
        assert len(folds) == expected_folds[stem], fscores
        for k in folds + ["mean"]:
            assert 0.0 <= fscores[k] <= 1.0, (stem, k, fscores)
        # diversity column (reference logs it next to F,
        # src/evaluate.py:36-38): same per-fold + mean shape
        diversity = entry["diversity"]
        assert set(diversity) == set(fscores), (stem, diversity)
        for k, v in diversity.items():
            assert np.isfinite(v), (stem, k, diversity)
        # checkpoint integrity cross-check: re-evaluating the flushed
        # best checkpoint reproduces the training-time best F per fold
        ckpt_f = entry["fscores_from_ckpt"]
        for k in folds:
            assert abs(ckpt_f[k] - fscores[k]) < 1e-3, (stem, k, ckpt_f,
                                                        fscores)
        # per-fold best checkpoints on the reference's naming contract
        for i in range(expected_folds[stem]):
            ckpt = (tmp_path / "models" / "canonical" / stem / "checkpoint"
                    / f"{stem}.yml.{i}.pt")
            assert ckpt.exists(), ckpt
