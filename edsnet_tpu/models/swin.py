"""Flax Swin-V2-B feature extractor (pooled 1024-d, pre-head).

The reference's second frame-feature option (`--feature-extractor
swin-transformer`, video_helper.py:36-45): torchvision's swin_v2_b with
the classification head stripped (`nn.Sequential(*list(m.children())
[:-1])`, video_helper.py:44-46) = features -> final LayerNorm -> global
average pool -> flatten, 1024-d, then L2-normalized per frame
(video_helper.py:70-73).

Line-faithful NHWC re-implementation of torchvision's SwinTransformer V2
in eval mode (stochastic depth = identity, dropouts off), plus a
converter from the released checkpoint's exact state_dict naming (same
pattern as models/{googlenet,convnext}.py).  Architectural facts
mirrored from torchvision 0.15 swin_transformer.py:

- patch embed: 4x4/4 conv + LN(eps 1e-5);
- SwinTransformerBlockV2 (res-POST-norm): x += norm1(attn(x));
  x += norm2(mlp(x)); mlp = Linear 4x -> GELU -> Linear;
- ShiftedWindowAttentionV2: window 8x8, shift 4 on odd blocks, feature
  maps padded to window multiples (pad rows ATTEND — torchvision does
  not clamp the window at the 7x7 stage, it pads to 8); cosine attention
  q_hat k_hat^T * exp(clamp(logit_scale, max=ln 100)); continuous
  relative position bias 16*sigmoid(cpb_mlp(log-spaced coords)); the K
  bias of the fused QKV is zeroed at use;
- PatchMergingV2: 2x2 concat -> Linear(4C, 2C, no bias) -> LN;
- swin_v2_b config: embed 128, depths (2, 2, 18, 2), heads
  (4, 8, 16, 32), final LN over 1024.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

EMBED = 128
DEPTHS = (2, 2, 18, 2)
HEADS = (4, 8, 16, 32)
WINDOW = 8
LN_EPS = 1e-5


def _relative_coords_table(ws: int) -> np.ndarray:
    """V2 log-spaced CPB input coords: [(2w-1)^2, 2] float32."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    table = table / (ws - 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    return table.reshape(-1, 2)


def _relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] indices into the (2w-1)^2 CPB table rows."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))           # [2, w, w]
    flat = coords.reshape(2, -1)                             # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]                # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                       # [N, N]


def _shift_attn_mask(pad_h: int, pad_w: int, ws: int, shift_h: int,
                     shift_w: int) -> np.ndarray:
    """[num_windows, ws*ws, ws*ws] additive mask (0 or -100) separating
    the wrapped regions after the cyclic shift (torchvision
    shifted_window_attention; shift may be zero on one axis only)."""
    region = np.zeros((pad_h, pad_w), np.float32)
    cnt = 0
    for hs in ((0, pad_h - ws), (pad_h - ws, pad_h - shift_h),
               (pad_h - shift_h, pad_h)):
        for ws_ in ((0, pad_w - ws), (pad_w - ws, pad_w - shift_w),
                    (pad_w - shift_w, pad_w)):
            region[hs[0]:hs[1], ws_[0]:ws_[1]] = cnt
            cnt += 1
    region = region.reshape(pad_h // ws, ws, pad_w // ws, ws)
    region = region.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class ShiftedWindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    shift: int          # 0 or WINDOW // 2

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = WINDOW
        head_dim = c // self.num_heads

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(),
            (c, 3 * c))
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * c,))
        # V2 zeroes the K third of the fused bias at use
        qkv_bias = jnp.asarray(qkv_bias).at[c:2 * c].set(0.0)
        logit_scale = self.param(
            "logit_scale",
            lambda k, s: jnp.full(s, math.log(10.0)), (self.num_heads,))
        cpb_w1 = self.param("cpb_w1", nn.initializers.xavier_uniform(),
                            (2, 512))
        cpb_b1 = self.param("cpb_b1", nn.initializers.zeros, (512,))
        cpb_w2 = self.param("cpb_w2", nn.initializers.xavier_uniform(),
                            (512, self.num_heads))
        proj_kernel = self.param("proj_kernel",
                                 nn.initializers.xavier_uniform(), (c, c))
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (c,))

        # pad to window multiples (pad rows attend; torchvision semantics)
        pad_b_ = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b_), (0, pad_r), (0, 0)))
        ph, pw = h + pad_b_, w + pad_r
        # torchvision clamps the shift PER AXIS when the window covers
        # that padded dimension
        shift_h = 0 if ws >= ph else self.shift
        shift_w = 0 if ws >= pw else self.shift
        shifted = shift_h + shift_w > 0
        if shifted:
            x = jnp.roll(x, (-shift_h, -shift_w), axis=(1, 2))

        nh, nw = ph // ws, pw // ws
        nwin = nh * nw
        n = ws * ws
        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nwin, n, c)

        qkv = xw @ qkv_kernel + qkv_bias
        qkv = qkv.reshape(b * nwin, n, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)                  # [3, B*, H, n, d]
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention with learned per-head temperature
        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
        attn = (qn @ kn.transpose(0, 1, 3, 2)) \
            * scale[None, :, None, None]

        # continuous relative position bias
        table = jnp.asarray(_relative_coords_table(ws))      # [(2w-1)^2, 2]
        cpb = nn.relu(table @ cpb_w1 + cpb_b1) @ cpb_w2      # [., H]
        idx = _relative_position_index(ws).reshape(-1)
        bias = cpb[idx].reshape(n, n, self.num_heads)
        bias = 16.0 * nn.sigmoid(bias.transpose(2, 0, 1))    # [H, n, n]
        attn = attn + bias[None]

        if shifted:
            mask = jnp.asarray(
                _shift_attn_mask(ph, pw, ws, shift_h, shift_w))
            attn = attn.reshape(b, nwin, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b * nwin, self.num_heads, n, n)

        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b * nwin, n, c)
        out = out @ proj_kernel + proj_bias

        out = out.reshape(b, nh, nw, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
        if shifted:
            out = jnp.roll(out, (shift_h, shift_w), axis=(1, 2))
        return out[:, :h, :w]


class SwinBlockV2(nn.Module):
    dim: int
    num_heads: int
    shift: int

    @nn.compact
    def __call__(self, x):
        y = ShiftedWindowAttentionV2(self.dim, self.num_heads, self.shift,
                                     name="attn")(x)
        x = x + nn.LayerNorm(epsilon=LN_EPS, name="norm1")(y)
        y = nn.Dense(4 * self.dim, name="mlp1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp2")(y)
        return x + nn.LayerNorm(epsilon=LN_EPS, name="norm2")(y)


class PatchMergingV2(nn.Module):
    dim: int   # input channels C; output 2C

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class SwinV2BFeatures(nn.Module):
    """[N, 224, 224, 3] normalized NHWC -> [N, 1024] pooled features."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(EMBED, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_conv")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(x)
        dim = EMBED
        for s, depth in enumerate(DEPTHS):
            if s > 0:
                x = PatchMergingV2(dim, name=f"merge{s}")(x)
                dim *= 2
            for b in range(depth):
                shift = 0 if b % 2 == 0 else WINDOW // 2
                x = SwinBlockV2(dim, HEADS[s], shift,
                                name=f"stage{s}_block{b}")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="final_norm")(x)
        return jnp.mean(x, axis=(1, 2))


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision swin_v2_b state_dict -> flax variables.

    Accepts the full checkpoint (head.* entries and the CPB buffers —
    recomputed statically here — are skipped).  torchvision key layout:
    features.0.{0,2} = patch conv + LN; features.{1,3,5,7}.{j} = stage
    blocks (norm1/norm2, attn.{qkv,proj,logit_scale,cpb_mlp}, mlp.{0,3});
    features.{2,4,6} = PatchMergingV2 (reduction, norm); norm = final LN.
    """
    def as_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    params: Dict[str, Any] = {
        "patch_conv": {
            "kernel": as_np(sd["features.0.0.weight"]).transpose(2, 3, 1, 0),
            "bias": as_np(sd["features.0.0.bias"]),
        },
        "patch_norm": {
            "scale": as_np(sd["features.0.2.weight"]),
            "bias": as_np(sd["features.0.2.bias"]),
        },
        "final_norm": {
            "scale": as_np(sd["norm.weight"]),
            "bias": as_np(sd["norm.bias"]),
        },
    }
    stage_feature_idx = (1, 3, 5, 7)
    for s, (depth, fi) in enumerate(zip(DEPTHS, stage_feature_idx)):
        if s > 0:
            mi = fi - 1
            params[f"merge{s}"] = {
                "reduction": {
                    "kernel": as_np(sd[f"features.{mi}.reduction.weight"]).T},
                "norm": {
                    "scale": as_np(sd[f"features.{mi}.norm.weight"]),
                    "bias": as_np(sd[f"features.{mi}.norm.bias"])},
            }
        for b in range(depth):
            pre = f"features.{fi}.{b}"
            params[f"stage{s}_block{b}"] = {
                "attn": {
                    "qkv_kernel": as_np(sd[f"{pre}.attn.qkv.weight"]).T,
                    "qkv_bias": as_np(sd[f"{pre}.attn.qkv.bias"]),
                    "logit_scale":
                        as_np(sd[f"{pre}.attn.logit_scale"]).reshape(-1),
                    "cpb_w1":
                        as_np(sd[f"{pre}.attn.cpb_mlp.0.weight"]).T,
                    "cpb_b1": as_np(sd[f"{pre}.attn.cpb_mlp.0.bias"]),
                    "cpb_w2":
                        as_np(sd[f"{pre}.attn.cpb_mlp.2.weight"]).T,
                    "proj_kernel": as_np(sd[f"{pre}.attn.proj.weight"]).T,
                    "proj_bias": as_np(sd[f"{pre}.attn.proj.bias"]),
                },
                "norm1": {"scale": as_np(sd[f"{pre}.norm1.weight"]),
                          "bias": as_np(sd[f"{pre}.norm1.bias"])},
                "norm2": {"scale": as_np(sd[f"{pre}.norm2.weight"]),
                          "bias": as_np(sd[f"{pre}.norm2.bias"])},
                "mlp1": {"kernel": as_np(sd[f"{pre}.mlp.0.weight"]).T,
                         "bias": as_np(sd[f"{pre}.mlp.0.bias"])},
                "mlp2": {"kernel": as_np(sd[f"{pre}.mlp.3.weight"]).T,
                         "bias": as_np(sd[f"{pre}.mlp.3.bias"])},
            }
    return {"params": params}
