"""Flax ConvNeXt-Base vs a torch oracle with random weights.

torchvision is absent from this image, so the oracle is a line-faithful
torch replica of torchvision's ConvNeXt-Base minus the classifier (the
reference's third feature extractor, video_helper.py:36-45,47-48) with
the exact state_dict key naming of the released checkpoint
(convnext_base-6075fbad.pth).  Weights are randomized, the state_dict is
run through ``convert_torch_state_dict``, and both networks must agree
<=1e-4 — so when fetch_weights caches the real torchvision file, the
converted flax model reproduces the reference feature contract on TPU.
"""
import hashlib

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from edsnet_tpu.models.convnext import (DEPTHS, DIMS, ConvNeXtBaseFeatures,
                                        convert_torch_state_dict)


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class LayerNorm2d(nn.LayerNorm):
    """torchvision.models.convnext.LayerNorm2d: LN over C of NCHW."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias,
                         self.eps)
        return x.permute(0, 3, 1, 2)


class CNBlockT(nn.Module):
    """torchvision CNBlock, eval mode (stochastic depth = identity)."""

    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.ones(dim, 1, 1) * 1e-6)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class ConvNeXtBaseTorch(nn.Module):
    """features + avgpool; classifier stripped like video_helper.py:47-48.
    Key naming matches torchvision convnext_base exactly."""

    def __init__(self):
        super().__init__()
        layers = [nn.Sequential(
            nn.Conv2d(3, DIMS[0], 4, stride=4),
            LayerNorm2d(DIMS[0], eps=1e-6))]
        for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                layers.append(nn.Sequential(
                    LayerNorm2d(DIMS[s - 1], eps=1e-6),
                    nn.Conv2d(DIMS[s - 1], dim, 2, stride=2)))
            layers.append(nn.Sequential(
                *[CNBlockT(dim) for _ in range(depth)]))
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        return torch.flatten(self.avgpool(self.features(x)), 1)


def _randomize(model, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)


def test_oracle_key_layout_matches_torchvision():
    """The oracle's state_dict keys must be exactly the released
    checkpoint's (spot anchors from convnext_base-6075fbad.pth)."""
    keys = set(ConvNeXtBaseTorch().state_dict())
    for want in ("features.0.0.weight", "features.0.1.bias",
                 "features.1.0.block.0.weight",
                 "features.1.0.block.2.weight",
                 "features.1.0.block.3.bias",
                 "features.1.0.block.5.weight",
                 "features.1.0.layer_scale",
                 "features.2.0.weight", "features.2.1.weight",
                 "features.5.26.block.5.bias",
                 "features.7.2.layer_scale"):
        assert want in keys, want
    # stage sizes: 3 + 3 + 27 + 3 blocks
    assert sum(1 for k in keys if k.endswith(".layer_scale")) == sum(DEPTHS)


def test_flax_convnext_matches_torch_random_weights():
    model_t = ConvNeXtBaseTorch()
    _randomize(model_t)
    model_t.eval()

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = model_t(x).numpy()

    variables = convert_torch_state_dict(model_t.state_dict())
    got = np.asarray(ConvNeXtBaseFeatures().apply(
        variables, np.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _real_weights_cached() -> bool:
    from edsnet_tpu.fetch_weights import WEIGHTS, cached_path
    path = cached_path("convnext")
    if not path.exists():
        return False
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    return digest.startswith(WEIGHTS["convnext"]["sha256_prefix"])


@pytest.mark.skipif(not _real_weights_cached(),
                    reason="real convnext_base-6075fbad.pth not cached; "
                           "run `python -m edsnet_tpu.fetch_weights "
                           "--models convnext` on a networked machine")
def test_flax_convnext_matches_torch_with_real_weights():
    from edsnet_tpu.fetch_weights import cached_path

    sd = torch.load(cached_path("convnext"), map_location="cpu",
                    weights_only=True)
    model_t = ConvNeXtBaseTorch()
    missing, _ = model_t.load_state_dict(sd, strict=False)
    assert not missing, missing
    model_t.eval()

    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    rng = np.random.RandomState(0)
    img = np.stack([yy, xx, 0.5 * (xx + yy)], 0)[None] \
        + 0.1 * rng.rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(img)).numpy()

    variables = convert_torch_state_dict(sd)
    got = np.asarray(ConvNeXtBaseFeatures().apply(
        variables, np.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_feature_extractor_uses_flax_convnext_from_cache(tmp_path,
                                                         monkeypatch):
    """FeatureExtractor('convnext') runs the flax network end-to-end from
    a cached checkpoint — without torchvision."""
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    import torch.hub
    monkeypatch.setattr(torch.hub, "_hub_dir", None, raising=False)

    from edsnet_tpu.data.video import (FeatureExtractor,
                                       _FlaxConvNeXtExtractor)
    from edsnet_tpu.fetch_weights import cached_path

    model_t = ConvNeXtBaseTorch()
    _randomize(model_t, seed=3)
    ckpt = cached_path("convnext")
    assert str(ckpt).startswith(str(tmp_path)), ckpt
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    torch.save(model_t.state_dict(), ckpt)

    fe = FeatureExtractor("convnext")
    assert isinstance(fe._impl, _FlaxConvNeXtExtractor)
    img = (np.random.RandomState(0).rand(360, 480, 3) * 255).astype(
        np.uint8)
    feat = fe.run(img)
    assert feat.shape == (1024,)
    assert abs(float(np.linalg.norm(feat)) - 1.0) < 1e-4
