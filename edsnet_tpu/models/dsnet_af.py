"""Anchor-free DSNet heads (FCOS-style cls/loc/ctr), batched + masked.

Reference: `src/anchor_free/dsnet_af.py`.  Each head returns per-position
(pred_cls [B,N] in (0,1), pred_loc [B,N,2] = exp(raw) LR extents,
pred_ctr [B,N] in (0,1)); ``predict`` multiplies cls by centerness,
normalizes by the per-video max, and decodes LR boxes on device
(dsnet_af.py:87-97).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.base import build_base_model
from edsnet_tpu.models.common import dense, layer_norm
from edsnet_tpu.models.dsnet import _FcTrunk
from edsnet_tpu.models.encoder import LocalGlobalEncoder

Array = jnp.ndarray


class _AFHeads(nn.Module):
    @nn.compact
    def __call__(self, out):
        pred_cls = nn.sigmoid(dense(1, name="fc_cls")(out)[..., 0])
        pred_loc = jnp.exp(dense(2, name="fc_loc")(out))
        pred_ctr = nn.sigmoid(dense(1, name="fc_ctr")(out)[..., 0])
        return pred_cls, pred_loc, pred_ctr


def _af_predict(pred_cls, pred_loc, pred_ctr, mask=None):
    """cls *= ctr; cls /= max; offsets -> LR boxes. (dsnet_af.py:87-97)"""
    cls = pred_cls * pred_ctr
    if mask is not None:
        cls = cls * mask.astype(cls.dtype)
    cls = cls / (jnp.max(cls, axis=-1, keepdims=True) + 1e-8)
    n = cls.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)
    left = idx[None, :] - pred_loc[..., 0]
    right = idx[None, :] + pred_loc[..., 1] + 1
    return cls, jnp.stack([left, right], axis=-1)


class DSNetAF(nn.Module):
    """Shallow anchor-free head. (dsnet_af.py:51-97)"""
    base_model: str
    num_feature: int
    num_hidden: int
    num_head: int
    fc_depth: int = 5
    orientation: str = "paper"
    tie_fc_blocks: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[Array] = None,
                 deterministic: bool = True):
        out = build_base_model(self.base_model, self.num_feature,
                               self.num_head, self.orientation)(
            x, mask, deterministic)
        out = out + x
        out = layer_norm(name="layer_norm")(out)
        out = _FcTrunk(self.num_hidden, self.fc_depth, self.tie_fc_blocks,
                       name="trunk")(out, deterministic)
        return _AFHeads(name="heads")(out)

    def predict(self, x, mask=None):
        return _af_predict(*self(x, mask, deterministic=True), mask)


class DSNetAFOriginal(nn.Module):
    """Faithful DSNet-AF baseline. (dsnet_af.py:7-48)"""
    base_model: str
    num_feature: int
    num_hidden: int
    num_head: int

    @nn.compact
    def __call__(self, x, mask: Optional[Array] = None,
                 deterministic: bool = True):
        out = build_base_model(self.base_model, self.num_feature,
                               self.num_head)(x, mask, deterministic)
        out = out + x
        out = layer_norm(name="layer_norm")(out)
        h = dense(self.num_hidden, name="fc1")(out)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        h = layer_norm(name="fc1_norm")(h)
        return _AFHeads(name="heads")(h)

    def predict(self, x, mask=None):
        return _af_predict(*self(x, mask, deterministic=True), mask)


class DSNetAFDeepAttention(nn.Module):
    """Two stacked base models with double residual. (dsnet_af.py:100-148)"""
    base_model: str
    num_feature: int
    num_hidden: int
    num_head: int
    fc_depth: int = 5
    orientation: str = "paper"
    tie_fc_blocks: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[Array] = None,
                 deterministic: bool = True):
        out1 = build_base_model(self.base_model, self.num_feature,
                                max(self.num_head // 2, 1), self.orientation,
                                name="base_model1")(x, mask, deterministic)
        out = build_base_model(self.base_model, self.num_feature,
                               self.num_head, self.orientation,
                               name="base_model2")(out1, mask, deterministic)
        out = x + out1 + out
        out = layer_norm(name="layer_norm")(out)
        out = _FcTrunk(self.num_hidden, self.fc_depth, self.tie_fc_blocks,
                       name="trunk")(out, deterministic)
        return _AFHeads(name="heads")(out)

    def predict(self, x, mask=None):
        return _af_predict(*self(x, mask, deterministic=True), mask)


class DSNetAFMultiAttention(nn.Module):
    """LocalGlobal encoder variant. (dsnet_af.py:151-194)"""
    base_model: str
    num_feature: int
    num_hidden: int
    num_head: int
    fc_depth: int = 5
    orientation: str = "paper"
    tie_fc_blocks: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[Array] = None,
                 deterministic: bool = True):
        out = LocalGlobalEncoder(
            self.base_model, self.orientation, self.num_feature,
            num_head=self.num_head, num_segments=4, local_attention_head=2,
            name="multiattention")(x, mask, deterministic)
        out = _FcTrunk(self.num_hidden, self.fc_depth, self.tie_fc_blocks,
                       name="trunk")(out, deterministic)
        return _AFHeads(name="heads")(out)

    def predict(self, x, mask=None):
        return _af_predict(*self(x, mask, deterministic=True), mask)
