"""Flax Swin-V2-B vs a torch oracle with random weights.

torchvision is absent from this image, so the oracle is a line-faithful
torch replica of torchvision's swin_v2_b minus the classification head
(the reference's second feature extractor, video_helper.py:36-46) with
the exact state_dict key naming of the released checkpoint
(swin_v2_b-781e5279.pth).  Weights are randomized, the state_dict is run
through ``convert_torch_state_dict``, and both networks must agree
<=1e-4 — so when fetch_weights caches the real torchvision file, the
converted flax model reproduces the reference feature contract on TPU.

The oracle mirrors torchvision 0.15 swin_transformer.py: the
shifted_window_attention free function (pad -> per-dim shift clamp ->
cyclic roll -> window partition -> cosine attention with clamped
logit_scale -> 16*sigmoid(CPB) bias -> shift region mask -> reverse),
SwinTransformerBlockV2's res-post-norm order, PatchMergingV2, and the
V2 runtime zeroing of the fused QKV's K bias.
"""
import hashlib
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from edsnet_tpu.models.swin import (DEPTHS, EMBED, HEADS, WINDOW,
                                    SwinV2BFeatures,
                                    convert_torch_state_dict)


def _shifted_window_attention_v2(x, qkv_w, qkv_b, proj_w, proj_b,
                                 logit_scale, rel_bias, window, shift,
                                 num_heads):
    """torchvision shifted_window_attention with logit_scale (V2)."""
    b, h, w, c = x.shape
    pad_r = (window - w % window) % window
    pad_b_ = (window - h % window) % window
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b_))
    _, ph, pw, _ = x.shape

    sh = 0 if window >= ph else shift
    sw = 0 if window >= pw else shift
    if sh + sw > 0:
        x = torch.roll(x, shifts=(-sh, -sw), dims=(1, 2))

    nwin = (ph // window) * (pw // window)
    n = window * window
    x = x.view(b, ph // window, window, pw // window, window, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b * nwin, n, c)

    qkv_b = qkv_b.clone()
    length = qkv_b.numel() // 3
    qkv_b[length:2 * length].zero_()
    qkv = F.linear(x, qkv_w, qkv_b)
    qkv = qkv.reshape(x.size(0), n, 3, num_heads, c // num_heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
    attn = attn * torch.clamp(logit_scale,
                              max=math.log(100.0)).exp().view(
        1, num_heads, 1, 1)
    attn = attn + rel_bias

    if sh + sw > 0:
        mask = x.new_zeros((ph, pw))
        cnt = 0
        for hs in ((0, ph - window), (ph - window, ph - sh),
                   (ph - sh, ph)):
            for ws_ in ((0, pw - window), (pw - window, pw - sw),
                        (pw - sw, pw)):
                mask[hs[0]:hs[1], ws_[0]:ws_[1]] = cnt
                cnt += 1
        mask = mask.view(ph // window, window, pw // window, window)
        mask = mask.permute(0, 2, 1, 3).reshape(nwin, n)
        mask = mask.unsqueeze(1) - mask.unsqueeze(2)
        mask = mask.masked_fill(mask != 0, -100.0)
        mask = mask.view(nwin, n, n)
        attn = attn.view(b, nwin, num_heads, n, n) \
            + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, n, n)

    attn = F.softmax(attn, dim=-1)
    x = (attn @ v).transpose(1, 2).reshape(x.size(0), n, c)
    x = F.linear(x, proj_w, proj_b)

    x = x.view(b, ph // window, pw // window, window, window, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
    if sh + sw > 0:
        x = torch.roll(x, shifts=(sh, sw), dims=(1, 2))
    return x[:, :h, :w].contiguous()


class ShiftedWindowAttentionV2T(nn.Module):
    def __init__(self, dim, num_heads, shift):
        super().__init__()
        self.num_heads = num_heads
        self.shift = shift
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones((num_heads, 1, 1))))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, num_heads, bias=False))
        ws = WINDOW
        r = torch.arange(-(ws - 1), ws, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(r, r, indexing="ij"), dim=-1)
        table = table / (ws - 1) * 8.0
        table = torch.sign(table) * torch.log2(table.abs() + 1.0) / 3.0
        self.register_buffer("relative_coords_table",
                             table.view(1, 2 * ws - 1, 2 * ws - 1, 2))
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index",
                             rel.sum(-1).flatten())

    def _bias(self):
        n = WINDOW * WINDOW
        cpb = self.cpb_mlp(self.relative_coords_table).view(
            -1, self.num_heads)
        bias = cpb[self.relative_position_index].view(n, n, -1)
        bias = bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        return 16 * torch.sigmoid(bias)

    def forward(self, x):
        return _shifted_window_attention_v2(
            x, self.qkv.weight, self.qkv.bias, self.proj.weight,
            self.proj.bias, self.logit_scale, self._bias(), WINDOW,
            self.shift, self.num_heads)


class SwinBlockV2T(nn.Module):
    def __init__(self, dim, num_heads, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = ShiftedWindowAttentionV2T(dim, num_heads, shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(4 * dim, dim), nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.norm1(self.attn(x))
        return x + self.norm2(self.mlp(x))


class PatchMergingV2T(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim, eps=1e-5)

    def forward(self, x):
        h, w = x.shape[1:3]
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.norm(self.reduction(x))


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class SwinV2BTorch(nn.Module):
    """features + norm + avgpool; head stripped like video_helper.py:44-46.
    Key naming matches torchvision swin_v2_b exactly."""

    def __init__(self):
        super().__init__()
        layers = [nn.Sequential(
            nn.Conv2d(3, EMBED, kernel_size=4, stride=4),
            Permute([0, 2, 3, 1]),
            nn.LayerNorm(EMBED, eps=1e-5))]
        dim = EMBED
        for s, depth in enumerate(DEPTHS):
            if s > 0:
                layers.append(PatchMergingV2T(dim))
                dim *= 2
            layers.append(nn.Sequential(*[
                SwinBlockV2T(dim, HEADS[s], 0 if b % 2 == 0 else WINDOW // 2)
                for b in range(depth)]))
        self.features = nn.Sequential(*layers)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.permute = Permute([0, 3, 1, 2])
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.permute(self.norm(self.features(x)))
        return torch.flatten(self.avgpool(x), 1)


def _randomize(model, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("logit_scale"):
                p.copy_(torch.rand_like(p) * 2.0)
            else:
                p.copy_(torch.randn_like(p) * 0.05)


def test_oracle_key_layout_matches_torchvision():
    """Spot anchors from swin_v2_b-781e5279.pth's key set."""
    keys = set(SwinV2BTorch().state_dict())
    for want in ("features.0.0.weight", "features.0.2.bias",
                 "features.1.0.norm1.weight",
                 "features.1.0.attn.qkv.weight",
                 "features.1.0.attn.logit_scale",
                 "features.1.0.attn.cpb_mlp.0.weight",
                 "features.1.0.attn.cpb_mlp.2.weight",
                 "features.1.0.attn.proj.bias",
                 "features.1.0.mlp.0.weight",
                 "features.1.0.mlp.3.weight",
                 "features.1.1.attn.relative_position_index",
                 "features.2.reduction.weight", "features.2.norm.weight",
                 "features.5.17.norm2.bias",
                 "features.7.1.attn.qkv.bias",
                 "norm.weight"):
        assert want in keys, want
    assert sum(1 for k in keys if k.endswith("logit_scale")) == sum(DEPTHS)


@pytest.mark.parametrize("res,blocks", [(32, 2)])
def test_flax_swin_stage_matches_torch(res, blocks):
    """One full stage (shifted + unshifted block) at a small resolution —
    fast iteration on the attention semantics before the 224 e2e test."""
    torch.manual_seed(1)
    stage = nn.Sequential(*[
        SwinBlockV2T(EMBED, 4, 0 if b % 2 == 0 else WINDOW // 2)
        for b in range(blocks)])
    _randomize(stage, seed=1)
    stage.eval()
    x = torch.randn(2, res, res, EMBED)
    with torch.no_grad():
        want = stage(x).numpy()

    sd = {f"features.1.{k}": v for k, v in stage.state_dict().items()}
    # minimal fake full checkpoint around the stage under test
    import jax

    from edsnet_tpu.models.swin import SwinBlockV2
    flax_stage_params = convert_torch_state_dict(
        _pad_full_sd(sd))["params"]
    xs = jax.numpy.asarray(x.numpy())
    out = xs
    for b in range(blocks):
        shift = 0 if b % 2 == 0 else WINDOW // 2
        out = SwinBlockV2(EMBED, 4, shift).apply(
            {"params": flax_stage_params[f"stage0_block{b}"]}, out)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def _pad_full_sd(partial):
    """Wrap a features.1.* stage state_dict with minimal other entries so
    convert_torch_state_dict can walk the whole layout."""
    full = SwinV2BTorch()
    sd = full.state_dict()
    sd.update(partial)
    return sd


def test_flax_swin_matches_torch_random_weights():
    model_t = SwinV2BTorch()
    _randomize(model_t)
    model_t.eval()

    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        want = model_t(x).numpy()

    variables = convert_torch_state_dict(model_t.state_dict())
    got = np.asarray(SwinV2BFeatures().apply(
        variables, np.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape == (1, 1024)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _real_weights_cached() -> bool:
    from edsnet_tpu.fetch_weights import WEIGHTS, cached_path
    path = cached_path("swin-transformer")
    if not path.exists():
        return False
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    return digest.startswith(WEIGHTS["swin-transformer"]["sha256_prefix"])


@pytest.mark.skipif(not _real_weights_cached(),
                    reason="real swin_v2_b-781e5279.pth not cached; run "
                           "`python -m edsnet_tpu.fetch_weights --models "
                           "swin-transformer` on a networked machine")
def test_flax_swin_matches_torch_with_real_weights():
    from edsnet_tpu.fetch_weights import cached_path

    sd = torch.load(cached_path("swin-transformer"), map_location="cpu",
                    weights_only=True)
    model_t = SwinV2BTorch()
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
    got = np.asarray(SwinV2BFeatures().apply(
        variables, np.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
