"""Full infer CLI: ckpt -> mp4 -> features -> KTS -> summary video on disk."""
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("device_kts", [False, True])
def test_infer_cli_end_to_end(tmp_path, monkeypatch, device_kts):
    import jax
    import jax.numpy as jnp

    from edsnet_tpu import infer
    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.utils import checkpoint as ckpt_lib

    # tiny source video: 2 distinct scenes, 300 frames
    src = tmp_path / "source.mp4"
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(src), fourcc, 30.0, (64, 64))
    rng = np.random.RandomState(0)
    # 10 short scenes so several shots fit inside the 15% knapsack budget
    for scene in range(10):
        base = np.zeros((64, 64, 3), np.uint8)
        r0, c0 = (scene * 13) % 48, (scene * 29) % 48
        base[r0:r0 + 16, c0:c0 + 16] = 220
        for _ in range(30):
            frame = np.clip(base.astype(np.int32)
                            + rng.randint(-8, 8, base.shape), 0,
                            255).astype(np.uint8)
            out.write(frame)
    out.release()

    # minimal trained-shape checkpoint (random init is fine for plumbing)
    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=1024, num_hidden=8,
                      anchor_scales=(4,), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 20, 1024)),
                           jnp.ones((1, 20), bool))
    ckpt_path = tmp_path / "model.pt"
    ckpt_lib.save_checkpoint(variables, ckpt_path)

    save_path = tmp_path / "summary.mp4"
    argv = ["infer.py", "anchor-based", "--base-model", "linear",
            "--num-hidden", "8", "--anchor-scales", "4", "--num-head", "2",
            "--fc-depth", "1", "--ckpt-path", str(ckpt_path),
            "--source", str(src), "--save-path", str(save_path),
            "--feature-extractor", "random"]
    if device_kts:
        argv.append("--device-kts")
    monkeypatch.setattr(sys, "argv", argv)
    infer.main()

    assert save_path.exists() and save_path.stat().st_size > 0
    cap = cv2.VideoCapture(str(save_path))
    n_out = 0
    while True:  # CAP_PROP_FRAME_COUNT is unreliable on fresh mp4v files
        ret, _ = cap.read()
        if not ret:
            break
        n_out += 1
    cap.release()
    # 15% budget over 300 frames, shot granularity can round up slightly
    assert 0 < n_out <= 0.2 * 300 + 30
