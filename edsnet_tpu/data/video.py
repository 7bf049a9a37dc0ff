"""Video preprocessing: frame decode (host), CNN features, KTS shots.

Reference: `src/helpers/video_helper.py`.  Decode stays host-side (cv2);
KTS runs through the native C++/NumPy DP (edsnet_tpu/ops/kts.py).

Feature extractors (video_helper.py:27-73): GoogLeNet pool5 / Swin-V2-B /
ConvNeXt-Base, 1024-d L2-normalized per frame.  torchvision is not part of
this image's baked dependencies, so the torchvision-backed extractors are
gated behind an import; a deterministic ``random`` extractor (hash-seeded
projection of downsampled pixels) exists for tests and plumbing runs.
"""
from __future__ import annotations

from os import PathLike
from pathlib import Path
from typing import Tuple

import numpy as np



def ends_with_mp4(path: PathLike) -> bool:
    return str(path).endswith(".mp4")


class _TorchvisionExtractor:
    def __init__(self, kind: str):
        import torch
        from torch import nn
        from torchvision import models, transforms

        self._torch = torch
        self.preprocess = transforms.Compose([
            transforms.Resize(256),
            transforms.CenterCrop(224),
            transforms.ToTensor(),
            transforms.Normalize(mean=[0.485, 0.456, 0.406],
                                 std=[0.229, 0.224, 0.225]),
        ])
        if kind == "google-net":
            m = models.googlenet(weights="DEFAULT")
            m = nn.Sequential(*list(m.children())[:-2])
        elif kind == "swin-transformer":
            m = models.swin_v2_b(weights="DEFAULT")
            m = nn.Sequential(*list(m.children())[:-1])
        elif kind == "convnext":
            m = models.convnext_base(weights="DEFAULT")
            m = nn.Sequential(*list(m.children())[:-1])
        else:
            raise ValueError(f"Invalid feature extractor {kind}")
        self.model = m.eval()

    def run(self, img: np.ndarray) -> np.ndarray:
        from PIL import Image
        torch = self._torch
        batch = self.preprocess(Image.fromarray(img)).unsqueeze(0)
        with torch.no_grad():
            feat = self.model(batch).view(-1).cpu().numpy()
        assert feat.shape == (1024,), \
            f"Invalid feature shape {feat.shape}: expected 1024"
        return feat / (np.linalg.norm(feat) + 1e-10)


class _FlaxCheckpointExtractor:
    """Device-side feature CNN from a cached torchvision checkpoint: PIL
    preprocessing on the host, the network as one jitted program on the
    accelerator.  Needs torch only to read the cached .pth
    (weights_only=True — data, not pickled code); torchvision itself is
    NOT required.  Subclasses pin (weights_key, flax module, converter).
    """

    weights_key: str = ""            # fetch_weights.WEIGHTS key

    def _module_and_converter(self):
        raise NotImplementedError

    def __init__(self):
        from edsnet_tpu.fetch_weights import cached_path
        from edsnet_tpu.models.googlenet import preprocess_frame

        path = cached_path(self.weights_key)
        if not path.exists():
            raise FileNotFoundError(
                f"no cached {self.weights_key} weights at {path}; run "
                f"`python -m edsnet_tpu.fetch_weights --models "
                f"{self.weights_key}` first")
        try:
            import torch
        except ImportError as e:
            # distinct from the no-checkpoint case: re-running
            # fetch_weights cannot help here
            raise RuntimeError(
                f"cached {self.weights_key} weights found at {path}, but "
                f"torch is required to read the .pth checkpoint "
                f"(weights_only deserialization); install torch or pass "
                f"feature_extractor='random'") from e
        sd = torch.load(path, map_location="cpu", weights_only=True)
        import jax

        module, convert = self._module_and_converter()
        self._variables = convert(sd)
        self._apply = jax.jit(module.apply)
        self._preprocess = preprocess_frame

    def run(self, img: np.ndarray) -> np.ndarray:
        feat = np.asarray(
            self._apply(self._variables, self._preprocess(img)[None]))[0]
        return feat / (np.linalg.norm(feat) + 1e-10)


class _FlaxGoogLeNetExtractor(_FlaxCheckpointExtractor):
    """GoogLeNet-pool5 (models/googlenet.py)."""
    weights_key = "google-net"

    def _module_and_converter(self):
        from edsnet_tpu.models.googlenet import (GoogLeNetPool5,
                                                 convert_torch_state_dict)
        return GoogLeNetPool5(), convert_torch_state_dict


class _FlaxConvNeXtExtractor(_FlaxCheckpointExtractor):
    """ConvNeXt-Base (models/convnext.py)."""
    weights_key = "convnext"

    def _module_and_converter(self):
        from edsnet_tpu.models.convnext import (ConvNeXtBaseFeatures,
                                                convert_torch_state_dict)
        return ConvNeXtBaseFeatures(), convert_torch_state_dict


class _FlaxSwinExtractor(_FlaxCheckpointExtractor):
    """Swin-V2-B (models/swin.py)."""
    weights_key = "swin-transformer"

    def _module_and_converter(self):
        from edsnet_tpu.models.swin import (SwinV2BFeatures,
                                            convert_torch_state_dict)
        return SwinV2BFeatures(), convert_torch_state_dict


class _RandomProjectionExtractor:
    """Deterministic test extractor: 1024-d projection of 32x32 grayscale."""

    def __init__(self, dim: int = 1024, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(32 * 32, dim).astype(np.float32) / 32.0
        self.dim = dim

    def run(self, img: np.ndarray) -> np.ndarray:
        import cv2
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        small = cv2.resize(gray, (32, 32)).astype(np.float32) / 255.0
        feat = small.reshape(-1) @ self.proj
        return feat / (np.linalg.norm(feat) + 1e-10)


class FeatureExtractor:
    """1024-d per-frame features, L2-normalized. (video_helper.py:27-73)"""

    def __init__(self, feature_extractor: str = "google-net"):
        if feature_extractor == "random":
            self._impl = _RandomProjectionExtractor()
            return
        flax_impls = {"google-net": _FlaxGoogLeNetExtractor,
                      "convnext": _FlaxConvNeXtExtractor,
                      "swin-transformer": _FlaxSwinExtractor}
        if feature_extractor in flax_impls:
            # prefer the device-side flax network when the checkpoint is
            # cached (no torchvision needed); fall back to torchvision
            try:
                self._impl = flax_impls[feature_extractor]()
                return
            except FileNotFoundError:
                # no cached checkpoint: fall through to torchvision / the
                # curated RuntimeError. (A cached checkpoint WITHOUT torch
                # raises its own RuntimeError above — re-running
                # fetch_weights cannot fix that, so it must not fall into
                # the torchvision advice.)
                pass
        try:
            self._impl = _TorchvisionExtractor(feature_extractor)
        except ImportError as e:
            raise RuntimeError(
                "torchvision is required for pretrained frame-feature "
                "extraction but is not installed in this environment. "
                "Either run `python -m edsnet_tpu.fetch_weights` to cache "
                "GoogLeNet weights for the device-side extractor, use "
                "pre-extracted features (the eccv16 h5 datasets), or pass "
                "feature_extractor='random' for plumbing tests.") from e

    def run(self, img: np.ndarray) -> np.ndarray:
        return self._impl.run(img)


class VideoPreprocessor:
    """mp4 -> (n_frames, features, change_points, nfps, picks).

    (video_helper.py:76-131; note infer.py:22 at HEAD omits the required
    feature_extractor argument — we default it instead.)
    """

    def __init__(self, sample_rate: int,
                 feature_extractor: str = "google-net",
                 device_kts: bool = False):
        self.model = FeatureExtractor(feature_extractor)
        self.sample_rate = sample_rate
        self.device_kts = device_kts

    def get_features(self, video_path: PathLike) -> Tuple[int, np.ndarray]:
        import cv2
        video_path = Path(video_path)
        cap = cv2.VideoCapture(str(video_path))
        assert cap is not None and cap.isOpened(), \
            f"Cannot open video: {video_path}"

        features = []
        n_frames = 0
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if n_frames % self.sample_rate == 0:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                features.append(self.model.run(frame))
            n_frames += 1
        cap.release()
        return n_frames, np.asarray(features, dtype=np.float32)

    def kts(self, n_frames: int, features: np.ndarray):
        """Linear-kernel KTS segmentation. (video_helper.py:109-126)

        Delegates to h5io.segment_features — the one place holding the
        gram/solver/shot-table math (the reference repeats it inline in
        three files)."""
        from edsnet_tpu.data import h5io
        cps, nfps, picks = h5io.segment_features(
            features, self.sample_rate, n_frames, device=self.device_kts)
        return cps, nfps, picks

    def run(self, video_path: PathLike):
        n_frames, features = self.get_features(video_path)
        cps, nfps, picks = self.kts(n_frames, features)
        return n_frames, features, cps, nfps, picks
