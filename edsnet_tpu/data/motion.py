"""Motion-feature extraction for the cross-attention head.

Reference: `src/motion_feature_extractor/feature_extractor.py` — a
TensorFlow-1.x I3D RGB feature dumper that is vestigial at HEAD (it imports
a missing ``i3d`` module) and whose .npy outputs feed the optional
``motion_features`` h5 key consumed by DSNetMotionFeatures
(make_dataset.py:93-99, dsnet.py:280-338).

This is a working JAX replacement: a small 3-D conv network over sliding
RGB clips (I3D-style inflated conv stack) producing 1024-d per-clip
features.  Pretrained Kinetics weights are not obtainable in this offline
image, so two practical backends exist:

- 'conv3d':   the flax network (random or user-loaded weights via
              ``--weights`` msgpack) — structural stand-in for I3D.
- 'flowdiff': a training-free motion descriptor (pooled frame-difference
              energy pyramid), deterministic, useful signal without any
              pretrained weights.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class Conv3DMotionNet:
    """Inflated 3D conv stack: (T, H, W, 3) clip -> 1024-d feature."""

    def __init__(self, weights: Optional[str] = None, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, x):  # [B, T, H, W, 3]
                widths = (64, 128, 256, 512)
                for i, w in enumerate(widths):
                    x = nn.Conv(w, (3, 3, 3), strides=(1 if i == 0 else 2,
                                                       2, 2),
                                name=f"conv{i}")(x)
                    x = nn.relu(x)
                x = jnp.mean(x, axis=(1, 2, 3))          # global avg pool
                return nn.Dense(1024, name="head")(x)

        self._jnp = jnp
        self.net = _Net()
        dummy = jnp.zeros((1, 8, 112, 112, 3), jnp.float32)
        self.variables = self.net.init(jax.random.PRNGKey(seed), dummy)
        if weights:
            from flax import serialization
            self.variables = serialization.from_bytes(
                self.variables, Path(weights).read_bytes())
        self._apply = jax.jit(self.net.apply)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        out = self._apply(self.variables,
                          self._jnp.asarray(clip[None], self._jnp.float32))
        feat = np.asarray(out)[0]
        return feat / (np.linalg.norm(feat) + 1e-10)


class FlowDiffMotion:
    """Training-free motion descriptor: multi-scale pooled |frame diff|."""

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        import cv2
        diffs = np.abs(np.diff(clip.astype(np.float32), axis=0)).mean(-1)
        feats = []
        for scale in (4, 8, 16):
            pooled = np.stack([
                cv2.resize(d, (scale, scale)) for d in diffs]).mean(0)
            feats.append(pooled.reshape(-1))
        feat = np.concatenate(feats)
        out = np.zeros(1024, np.float32)
        out[:feat.size] = feat[:1024]
        return out / (np.linalg.norm(out) + 1e-10)


def make_motion_net(backend: str = "flowdiff",
                    weights: Optional[str] = None):
    """Construct the backend once; reuse across videos (the conv3d
    backend pays a flax init + jit compile per construction)."""
    return (Conv3DMotionNet(weights) if backend == "conv3d"
            else FlowDiffMotion())


def extract_motion_features(video_path, clip_len: int = 8,
                            sample_rate: int = 15, backend: str = "flowdiff",
                            weights: Optional[str] = None,
                            net=None) -> np.ndarray:
    """mp4 -> [num_picks, 1024] motion features (one per sampled frame,
    computed over the surrounding clip).

    Streams the decode: only a clip-sized window of frames is resident
    (a 2-hour video would otherwise buffer ~8 GB of uint8 frames).
    ``net`` reuses a ``make_motion_net`` instance across videos.
    """
    import cv2

    if net is None:
        net = make_motion_net(backend, weights)

    cap = cv2.VideoCapture(str(video_path))
    assert cap.isOpened(), f"Cannot open video: {video_path}"

    # window[i] holds frame (read - len(window) + 1 + i); a clip centered
    # at c covers [max(0, c - clip_len//2), ...clip_len frames), so one
    # frame becomes safe to featurize once clip_len - clip_len//2 frames
    # after its center have been read (or at EOF)
    lo_keep = clip_len // 2           # frames kept behind the next center
    window: list = []
    base = 0                          # absolute index of window[0]
    feats = []
    next_center = 0

    def emit(center, total):
        lo = max(0, center - clip_len // 2)
        clip = np.asarray(window[lo - base:lo - base + clip_len])
        if len(clip) < clip_len:
            clip = np.concatenate(
                [clip, np.repeat(clip[-1:], clip_len - len(clip), axis=0)])
        feats.append(net(clip / 255.0))

    read = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        window.append(cv2.resize(frame, (112, 112)))
        read += 1
        # centers whose full clip is now resident
        while next_center < read and \
                max(0, next_center - clip_len // 2) + clip_len <= read:
            emit(next_center, read)
            next_center += sample_rate
        # drop frames no longer reachable by any future clip (the keep
        # boundary is clamped to frames actually read — the next center
        # can lie beyond the stream position when sample_rate > clip_len)
        keep_from = min(max(0, next_center - lo_keep), read)
        drop = keep_from - base
        if drop > 0:
            del window[:drop]
            base = keep_from
    cap.release()
    # tail centers (clips clipped at EOF, padded with the last frame)
    while next_center < read:
        emit(next_center, read)
        next_center += sample_rate
    return np.asarray(feats, dtype=np.float32)


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--video-dir", type=str, required=True)
    parser.add_argument("--save-dir", type=str, required=True)
    parser.add_argument("--sample-rate", type=int, default=15)
    parser.add_argument("--backend", type=str, default="flowdiff",
                        choices=["flowdiff", "conv3d"])
    parser.add_argument("--weights", type=str, default=None)
    args = parser.parse_args(argv)

    import os
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    net = make_motion_net(args.backend, args.weights)
    for name in sorted(os.listdir(args.video_dir)):
        if not name.endswith(".mp4"):
            continue
        feats = extract_motion_features(
            Path(args.video_dir) / name, sample_rate=args.sample_rate,
            net=net)
        out = save_dir / (name.rsplit(".", 1)[0] + ".npy")
        np.save(out, feats)
        print(f"{name}: {feats.shape} -> {out}")


if __name__ == "__main__":
    main()
