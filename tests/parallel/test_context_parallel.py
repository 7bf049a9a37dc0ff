"""--context-parallel e2e: ring attention reachable from the evaluate CLI.

Trains a small attention-backbone model, then evaluates the checkpoint
twice on the 8-virtual-device mesh — once on the single-device path, once
with --context-parallel 8 routing the backbone through
parallel/ring_attention.py (sequence axis sharded, ppermute K/V rotation,
online-softmax merge).  The reported F-scores must match and the ring path
must actually have been taken.
"""
import re

import numpy as np
import pytest
import yaml


def _make_mock(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "mock_tvsum.h5", "w") as f:
        for i, n_seq in enumerate([56, 64, 60]):
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, 32).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, -1, keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            b = np.linspace(0, n_frames, 13, dtype=np.int32)
            g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
            g["n_frame_per_seg"] = b[1:] - b[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(2, n_frames) > 0.8).astype(
                np.float32)
    keys = [f"d/mock_tvsum.h5/video_{i}" for i in range(3)]
    with open(tmp_path / "mock.yml", "w") as f:
        yaml.dump([{"train_keys": keys[:2], "test_keys": keys[2:]}], f)


def _fscore_from(capsys):
    out = capsys.readouterr().out
    m = re.findall(r"F-score: ([0-9.]+)", out)
    assert m, f"no F-score in output:\n{out[-2000:]}"
    return float(m[-1])


def test_evaluate_cli_context_parallel_matches(tmp_path, capsys,
                                               monkeypatch):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import evaluate as evaluate_cli
    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    common = ["anchor-based", "--base-model", "attention",
              "--splits", str(tmp_path / "mock.yml"),
              "--data-root", str(tmp_path),
              "--model-dir", str(tmp_path / "m"),
              "--num-feature", "32", "--num-hidden", "8",
              "--fc-depth", "1", "--num-head", "2",
              "--bucket-size", "64", "--batch-size", "2",
              "--anchor-scales", "8"]
    train_cli.main(common + ["--max-epoch", "2"])
    capsys.readouterr()

    evaluate_cli.main(common)
    f_base = _fscore_from(capsys)

    calls = {"n": 0}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        evaluate_cli.main(common + ["--context-parallel", "8",
                                    "--cp-min-len", "64"])
    finally:
        base_lib.set_context_parallel(0)
    f_cp = _fscore_from(capsys)

    assert calls["n"] > 0, "ring attention was never invoked"
    assert f_cp == pytest.approx(f_base, abs=2e-4), (f_cp, f_base)
