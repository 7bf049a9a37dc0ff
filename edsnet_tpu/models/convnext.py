"""Flax ConvNeXt-Base feature extractor (pooled 1024-d, pre-classifier).

The reference's third frame-feature option (`--feature-extractor
convnext`, video_helper.py:36-45): torchvision's convnext_base with the
classifier stripped (`nn.Sequential(*list(m.children())[:-1])`,
video_helper.py:47-48) = features -> global average pool, i.e. the pooled
stage-4 output WITHOUT the classifier's final LayerNorm, flattened to
1024-d and L2-normalized per frame (video_helper.py:70-73).

This is a line-faithful NHWC re-implementation of torchvision's
ConvNeXt-Base in eval mode (stochastic depth = identity), plus a
converter from the released checkpoint's exact state_dict naming —
same pattern as models/googlenet.py.  Architectural facts mirrored from
torchvision 0.15 convnext.py: stem 4x4/4 conv + LN(eps 1e-6); stages of
CNBlocks (depthwise 7x7 -> LN -> Linear 4x -> GELU(exact) -> Linear ->
layer_scale, residual); LN + 2x2/2 conv downsamples between stages;
depths (3, 3, 27, 3), dims (128, 256, 512, 1024).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEPTHS = (3, 3, 27, 3)
DIMS = (128, 256, 512, 1024)
LN_EPS = 1e-6


class CNBlock(nn.Module):
    """One ConvNeXt block, eval mode (torchvision CNBlock)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=LN_EPS, name="norm")(y)
        y = nn.Dense(4 * self.dim, name="pw1")(y)
        # torch nn.GELU() defaults to the exact erf form
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pw2")(y)
        gamma = self.param("layer_scale", nn.initializers.ones,
                           (self.dim,))
        return x + y * gamma


class ConvNeXtBaseFeatures(nn.Module):
    """[N, 224, 224, 3] normalized NHWC -> [N, 1024] pooled features."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(DIMS[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="stem_norm")(x)
        for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"down{s}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            name=f"down{s}_conv")(x)
            for b in range(depth):
                x = CNBlock(dim, name=f"stage{s}_block{b}")(x)
        # AdaptiveAvgPool2d(1) + flatten; the classifier (final LN + fc)
        # is stripped by the reference
        return jnp.mean(x, axis=(1, 2))


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision convnext_base state_dict -> flax variables.

    Accepts the full checkpoint (classifier.* entries are skipped).
    torchvision key layout: features.0.{0,1} = stem conv + LN;
    features.{1,3,5,7}.{j}.block.{0,2,3,5} + .layer_scale = stage blocks;
    features.{2,4,6}.{0,1} = LN + downsample conv.
    """
    def as_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def conv(w):                     # [O, I, kh, kw] -> [kh, kw, I, O]
        return as_np(w).transpose(2, 3, 1, 0)

    def dwconv(w):                   # [C, 1, kh, kw] -> [kh, kw, 1, C]
        return as_np(w).transpose(2, 3, 1, 0)

    params: Dict[str, Any] = {}

    def put(module, **leaves):
        params[module] = {k: v for k, v in leaves.items()}

    put("stem_conv", kernel=conv(sd["features.0.0.weight"]),
        bias=as_np(sd["features.0.0.bias"]))
    put("stem_norm", scale=as_np(sd["features.0.1.weight"]),
        bias=as_np(sd["features.0.1.bias"]))

    stage_feature_idx = (1, 3, 5, 7)
    for s, (depth, fi) in enumerate(zip(DEPTHS, stage_feature_idx)):
        if s > 0:
            di = fi - 1
            put(f"down{s}_norm",
                scale=as_np(sd[f"features.{di}.0.weight"]),
                bias=as_np(sd[f"features.{di}.0.bias"]))
            put(f"down{s}_conv",
                kernel=conv(sd[f"features.{di}.1.weight"]),
                bias=as_np(sd[f"features.{di}.1.bias"]))
        for b in range(depth):
            pre = f"features.{fi}.{b}"
            params[f"stage{s}_block{b}"] = {
                "dwconv": {
                    "kernel": dwconv(sd[f"{pre}.block.0.weight"]),
                    "bias": as_np(sd[f"{pre}.block.0.bias"]),
                },
                "norm": {
                    "scale": as_np(sd[f"{pre}.block.2.weight"]),
                    "bias": as_np(sd[f"{pre}.block.2.bias"]),
                },
                "pw1": {
                    "kernel": as_np(sd[f"{pre}.block.3.weight"]).T,
                    "bias": as_np(sd[f"{pre}.block.3.bias"]),
                },
                "pw2": {
                    "kernel": as_np(sd[f"{pre}.block.5.weight"]).T,
                    "bias": as_np(sd[f"{pre}.block.5.bias"]),
                },
                "layer_scale": as_np(sd[f"{pre}.layer_scale"]).reshape(-1),
            }
    return {"params": params}
