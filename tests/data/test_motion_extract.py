"""Streaming motion extraction == the buffered-whole-video oracle.

The extractor streams the decode keeping only a clip-sized window resident
(a 2-hour video would otherwise buffer ~8 GB of frames); this pins its
output, including the EOF tail padding, to the straightforward
buffer-everything formulation it replaced.
"""
import cv2
import numpy as np
import pytest

from edsnet_tpu.data.motion import extract_motion_features, make_motion_net


def _write_video(path, rng, n_frames):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(str(path), fourcc, 30.0, (64, 64))
    for i in range(n_frames):
        base = np.zeros((64, 64, 3), np.uint8)
        base[(i * 3) % 48:(i * 3) % 48 + 16, :16] = 200
        frame = np.clip(base.astype(np.int32)
                        + rng.randint(-8, 8, base.shape),
                        0, 255).astype(np.uint8)
        out.write(frame)
    out.release()


def _buffered_oracle(video_path, clip_len, sample_rate, net):
    cap = cv2.VideoCapture(str(video_path))
    assert cap.isOpened()
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.resize(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB),
                                 (112, 112)))
    cap.release()
    frames = np.asarray(frames)
    feats = []
    for center in range(0, len(frames), sample_rate):
        lo = max(0, center - clip_len // 2)
        clip = frames[lo:lo + clip_len]
        if len(clip) < clip_len:
            clip = np.concatenate(
                [clip, np.repeat(clip[-1:], clip_len - len(clip), axis=0)])
        feats.append(net(clip / 255.0))
    return np.asarray(feats, dtype=np.float32)


@pytest.mark.parametrize("n_frames,rate", [(95, 15), (40, 7), (6, 15)])
def test_streaming_matches_buffered(tmp_path, n_frames, rate):
    src = tmp_path / f"clip_{n_frames}_{rate}.mp4"
    _write_video(src, np.random.RandomState(n_frames), n_frames)

    net = make_motion_net("flowdiff")
    got = extract_motion_features(src, clip_len=8, sample_rate=rate, net=net)
    want = _buffered_oracle(src, clip_len=8, sample_rate=rate, net=net)
    assert got.shape == want.shape == (-(-n_frames // rate), 1024)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
