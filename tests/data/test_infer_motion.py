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
