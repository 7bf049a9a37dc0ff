"""Infer CLI serves motion (cross-attention) models end-to-end.

The reference's infer.py cannot serve them at all (src/infer.py:14 builds
the model from vars(args) but its forward takes only one input); ours
extracts motion features on the fly (--motion-backend) or loads a
precomputed --motion-feature .npy (the data/motion.py CLI's output).
"""
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_video(path, rng, n_scenes=10, frames_per_scene=30):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, 30.0, (64, 64))
    for scene in range(n_scenes):
        base = np.zeros((64, 64, 3), np.uint8)
        r0, c0 = (scene * 13) % 48, (scene * 29) % 48
        base[r0:r0 + 16, c0:c0 + 16] = 220
        for _ in range(frames_per_scene):
            frame = np.clip(base.astype(np.int32)
                            + rng.randint(-8, 8, base.shape), 0,
                            255).astype(np.uint8)
            out.write(frame)
    out.release()


@pytest.mark.parametrize("precomputed", [False, True])
def test_infer_cli_motion_model(tmp_path, monkeypatch, precomputed):
    import jax
    import jax.numpy as jnp

    from edsnet_tpu import infer
    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.utils import checkpoint as ckpt_lib

    src = tmp_path / "source.mp4"
    _write_video(src, np.random.RandomState(0))

    model = get_model("anchor-based", model_depth="cross-attention",
                      base_model="attention", num_feature=1024,
                      num_hidden=8, anchor_scales=(4,), num_head=2,
                      fc_depth=1, attention_depth=1,
                      encoder_type="classic", orientation="paper",
                      pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 20, 1024)),
                           jnp.zeros((1, 20, 1024)),
                           jnp.ones((1, 20), bool), jnp.ones((1, 20), bool))
    ckpt_path = tmp_path / "model.pt"
    ckpt_lib.save_checkpoint(variables, ckpt_path)

    save_path = tmp_path / "summary.mp4"
    argv = ["infer.py", "anchor-based", "--model-depth", "cross-attention",
            "--base-model", "attention", "--num-hidden", "8",
            "--anchor-scales", "4", "--num-head", "2", "--fc-depth", "1",
            "--attention-depth", "1", "--ckpt-path", str(ckpt_path),
            "--source", str(src), "--save-path", str(save_path),
            "--feature-extractor", "random"]
    if precomputed:
        # the data/motion.py CLI's .npy contract: one row per sampled frame
        from edsnet_tpu.data.motion import extract_motion_features
        feats = extract_motion_features(src, sample_rate=15)
        npy = tmp_path / "source.npy"
        np.save(npy, feats)
        argv += ["--motion-feature", str(npy)]
    monkeypatch.setattr(sys, "argv", argv)
    infer.main()

    assert save_path.exists() and save_path.stat().st_size > 0


def _motion_args(**kw):
    import argparse
    base = dict(motion_feature=None, motion_backend="flowdiff",
                sample_rate=15, source="unused.mp4")
    base.update(kw)
    return argparse.Namespace(**base)


def test_load_motion_validation(tmp_path):
    """The motion loader fails loudly instead of silently mis-serving:
    width mismatches (otherwise an opaque XLA dot error), length
    mismatches (a dump from a different --sample-rate would otherwise be
    truncated to motion from the wrong timestamps), and non-1024
    checkpoints with the 1024-wide on-the-fly extractor."""
    from edsnet_tpu.infer import _load_motion

    rng = np.random.RandomState(0)
    good = tmp_path / "good.npy"
    np.save(good, rng.randn(20, 16).astype(np.float32))

    out = _load_motion(_motion_args(motion_feature=str(good)), 20, 16)
    assert out.shape == (20, 16)

    with pytest.raises(ValueError, match="expects width"):
        _load_motion(_motion_args(motion_feature=str(good)), 20, 32)

    # 3x the rows (dump made at --sample-rate 5) must NOT silently truncate
    over = tmp_path / "over.npy"
    np.save(over, rng.randn(60, 16).astype(np.float32))
    with pytest.raises(ValueError, match="sampled frames"):
        _load_motion(_motion_args(motion_feature=str(over)), 20, 16)

    with pytest.raises(ValueError, match="sampled frames"):  # too few
        _load_motion(_motion_args(motion_feature=str(good)), 24, 16)

    # <=2-row tail surplus tolerated (codec frame-count slack)
    over1 = tmp_path / "over1.npy"
    np.save(over1, rng.randn(21, 16).astype(np.float32))
    assert _load_motion(_motion_args(motion_feature=str(over1)),
                        20, 16).shape == (20, 16)

    # on-the-fly extractor emits 1024-d: a non-1024 checkpoint must fail
    # with a clear message BEFORE extraction (no video touched)
    with pytest.raises(ValueError, match="emits 1024"):
        _load_motion(_motion_args(), 20, 512)


def test_checkpoint_motion_width():
    """The motion width a checkpoint expects is read back from its
    restored cross-attention key projection (flax from_bytes keeps the
    CHECKPOINT's shapes, so the restore template cannot be trusted)."""
    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.parallel.eval_device import checkpoint_motion_width

    model = get_model("anchor-based", model_depth="cross-attention",
                      base_model="attention", num_feature=16,
                      num_hidden=8, anchor_scales=(4,), num_head=2,
                      fc_depth=1, attention_depth=1,
                      encoder_type="classic", orientation="paper",
                      pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 12, 16)),
                           jnp.zeros((1, 12, 24)),   # 24-wide motion
                           jnp.ones((1, 12), bool), jnp.ones((1, 12), bool))
    assert checkpoint_motion_width(variables) == 24

    plain = get_model("anchor-based", base_model="linear", num_feature=16,
                      num_hidden=8, anchor_scales=(4,), num_head=2,
                      fc_depth=1, attention_depth=1,
                      encoder_type="classic", orientation="paper",
                      pooling_type="roi")
    plain_vars = plain.init(rngs, jnp.zeros((1, 12, 16)),
                            jnp.ones((1, 12), bool))
    with pytest.raises(ValueError, match="cross_attn"):
        checkpoint_motion_width(plain_vars)


def test_motion_feature_with_non_motion_model_raises(tmp_path, monkeypatch):
    """--motion-feature with a non-motion model is a configuration error,
    not a silently ignored flag (the user believes motion conditioning
    was applied).  Raises before any video/checkpoint IO."""
    from edsnet_tpu import infer

    argv = ["infer.py", "anchor-based", "--base-model", "linear",
            "--num-hidden", "8", "--anchor-scales", "4", "--fc-depth", "1",
            "--ckpt-path", str(tmp_path / "none.pt"),
            "--source", str(tmp_path / "none.mp4"),
            "--save-path", str(tmp_path / "out.mp4"),
            "--motion-feature", str(tmp_path / "none.npy")]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(ValueError, match="cross-attention"):
        infer.main()
