"""Flax GoogLeNet-pool5 vs a torch oracle with random weights.

torchvision is absent from this image, so the oracle is a line-faithful
torch replica of torchvision's GoogLeNet (minus dropout/fc — the
reference's feature extractor, video_helper.py:36-45) with the exact
state_dict key naming of the released checkpoint.  Weights AND BatchNorm
running statistics are randomized, the state_dict is run through
``convert_torch_state_dict``, and both networks must agree <=1e-4 — so
when fetch_weights caches the real torchvision file, the converted flax
model reproduces the reference feature contract on the TPU.
"""
import numpy as np
import pytest
import torch
from torch import nn

from edsnet_tpu.models.googlenet import (GoogLeNetPool5,
                                         convert_torch_state_dict)


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class Inception(nn.Module):
    def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.branch1 = BasicConv2d(cin, c1, kernel_size=1)
        self.branch2 = nn.Sequential(
            BasicConv2d(cin, c3r, kernel_size=1),
            BasicConv2d(c3r, c3, kernel_size=3, padding=1))
        self.branch3 = nn.Sequential(
            BasicConv2d(cin, c5r, kernel_size=1),
            BasicConv2d(c5r, c5, kernel_size=3, padding=1))
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(cin, pp, kernel_size=1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x),
                          self.branch3(x), self.branch4(x)], 1)


class GoogLeNetPool5Torch(nn.Module):
    """torchvision GoogLeNet children()[:-2], exact key naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
        self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):
        for name, m in self.named_children():
            x = m(x)
        return x.flatten(1)


def test_feature_extractor_uses_flax_path_from_cache(tmp_path,
                                                     monkeypatch):
    """FeatureExtractor('google-net') runs the flax network end-to-end
    from a cached checkpoint — without torchvision."""
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    import torch.hub
    monkeypatch.setattr(torch.hub, "_hub_dir", None, raising=False)

    from edsnet_tpu.data.video import (FeatureExtractor,
                                       _FlaxGoogLeNetExtractor)
    from edsnet_tpu.fetch_weights import cached_path

    torch.manual_seed(1)
    ckpt = cached_path("google-net")
    assert str(ckpt).startswith(str(tmp_path)), ckpt
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    torch.save(GoogLeNetPool5Torch().state_dict(), ckpt)

    fe = FeatureExtractor("google-net")
    assert isinstance(fe._impl, _FlaxGoogLeNetExtractor)
    img = (np.random.RandomState(0).rand(360, 480, 3) * 255).astype(
        np.uint8)
    feat = fe.run(img)
    assert feat.shape == (1024,)
    assert abs(float(np.linalg.norm(feat)) - 1.0) < 1e-4


def test_flax_googlenet_matches_torch_random_weights():
    torch.manual_seed(0)
    model_t = GoogLeNetPool5Torch()
    # randomize BN running stats too — converts must map them correctly
    with torch.no_grad():
        for m in model_t.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) + 0.5)
    model_t.eval()

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = model_t(x).numpy()

    variables = convert_torch_state_dict(model_t.state_dict())
    model_j = GoogLeNetPool5()
    got = np.asarray(model_j.apply(
        variables, np.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _real_weights_cached() -> bool:
    """True only when the REAL torchvision googlenet checkpoint is in the
    hub cache (sha256-verified — a test-fabricated .pth never matches)."""
    import hashlib

    from edsnet_tpu.fetch_weights import WEIGHTS, cached_path
    path = cached_path("google-net")
    if not path.exists():
        return False
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    return digest.startswith(WEIGHTS["google-net"]["sha256_prefix"])


@pytest.mark.skipif(not _real_weights_cached(),
                    reason="real googlenet-1378be20.pth not in the hub "
                           "cache; run `python -m edsnet_tpu.fetch_weights`"
                           " on a networked machine")
def test_flax_googlenet_matches_torch_with_real_weights():
    """The 1024-d feature contract with the RELEASED weights
    (video_helper.py:62-73): flax pool5 features == the torch oracle
    loaded from the same checkpoint, <=1e-4."""
    from edsnet_tpu.fetch_weights import cached_path

    sd = torch.load(cached_path("google-net"), map_location="cpu",
                    weights_only=True)
    model_t = GoogLeNetPool5Torch()
    missing, unexpected = model_t.load_state_dict(sd, strict=False)
    assert not missing, missing      # every pool5 key must be in the ckpt
    model_t.eval()

    # deterministic natural-image-like input (smooth gradients + texture)
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    rng = np.random.RandomState(0)
    img = np.stack([yy, xx, 0.5 * (xx + yy)], 0)[None] \
        + 0.1 * rng.rand(1, 3, 224, 224).astype(np.float32)
    x = torch.from_numpy(img)
    with torch.no_grad():
        want = model_t(x).numpy()

    variables = convert_torch_state_dict(sd)
    got = np.asarray(GoogLeNetPool5().apply(
        variables, np.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # and the end-user surface: FeatureExtractor produces the reference's
    # 1024-d L2-normalized per-frame feature from the cached weights
    from edsnet_tpu.data.video import FeatureExtractor, \
        _FlaxGoogLeNetExtractor
    fe = FeatureExtractor("google-net")
    assert isinstance(fe._impl, _FlaxGoogLeNetExtractor)
    frame = (np.random.RandomState(1).rand(360, 480, 3) * 255).astype(
        np.uint8)
    feat = fe.run(frame)
    assert feat.shape == (1024,)
    assert abs(float(np.linalg.norm(feat)) - 1.0) < 1e-4
