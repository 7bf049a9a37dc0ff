"""End-to-end inference path: synthetic mp4 -> features -> KTS -> summary.

Exercises VideoPreprocessor (cv2 decode + 'random' extractor + KTS on the
host DP) and infer.summarize_video with a fresh tiny model.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_mp4(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, 30.0, (64, 64))
    rng = np.random.RandomState(0)
    # 3 structurally distinct scenes (stripes/checkerboard), 100 frames each
    # — random-noise scenes are nearly collinear under the test projection
    bases = []
    v = np.zeros((64, 64, 3), np.uint8)
    v[:, :32] = 255            # left half bright
    bases.append(v)
    h = np.zeros((64, 64, 3), np.uint8)
    h[:32, :] = 255            # top half bright
    bases.append(h)
    c = np.zeros((64, 64, 3), np.uint8)
    for bi in range(0, 64, 16):  # coarse checkerboard
        for bj in range(0, 64, 16):
            if (bi // 16 + bj // 16) % 2 == 0:
                c[bi:bi + 16, bj:bj + 16] = 255
    bases.append(c)
    for base in bases:
        for _ in range(100):
            frame = np.clip(base.astype(np.int32)
                            + rng.randint(-10, 10, base.shape), 0,
                            255).astype(np.uint8)
            out.write(frame)
    out.release()
    return path


def test_video_preprocessor(tiny_mp4):
    from edsnet_tpu.data.video import VideoPreprocessor
    proc = VideoPreprocessor(sample_rate=15, feature_extractor="random")
    n_frames, seq, cps, nfps, picks = proc.run(tiny_mp4)
    assert n_frames == 300
    assert seq.shape == (20, 1024)
    assert np.allclose(np.linalg.norm(seq, axis=-1), 1.0, atol=1e-4)
    assert cps[0, 0] == 0 and cps[-1, 1] == n_frames - 1
    assert (nfps == cps[:, 1] - cps[:, 0] + 1).all()
    assert (picks == np.arange(20) * 15).all()
    # scene cuts at 100 and 200 should be near detected change points
    detected = set()
    for first, _ in cps:
        detected.add(int(first))
    assert any(abs(d - 100) <= 15 for d in detected) or \
        any(abs(d - 200) <= 15 for d in detected)


def test_summarize_video(tiny_mp4):
    import jax
    from edsnet_tpu.data.video import VideoPreprocessor
    from edsnet_tpu.infer import summarize_video
    from edsnet_tpu.models.model_zoo import get_model

    proc = VideoPreprocessor(sample_rate=15, feature_extractor="random")
    n_frames, seq, cps, nfps, picks = proc.run(tiny_mp4)

    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=1024, num_hidden=8,
                      anchor_scales=(4,), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    import jax.numpy as jnp
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, len(seq), 1024)),
                           jnp.ones((1, len(seq)), bool))

    summ = summarize_video(model, variables, seq, cps, n_frames, nfps,
                           picks, nms_thresh=0.5)
    assert summ.shape == (n_frames,)
    assert summ.dtype == bool
    # 15% budget
    assert summ.sum() <= int(0.15 * n_frames) + max(nfps)
