"""Encoder combinators: Classic, MultiAttention (local+global), LocalGlobal.

Reference: `src/modules/encoder.py`.  ``ClassicEncoder.forward`` at HEAD uses
``out`` before assignment (encoder.py:17-20, a NameError); we implement the
evident intent: residual around the base model, then fc.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.base import build_base_model
from edsnet_tpu.models.common import dense, l2_normalize, layer_norm


class ClassicEncoder(nn.Module):
    """base_model + residual -> fc. (encoder.py:7-23, intent-fixed)"""
    base_model: str
    num_feature: int
    num_head: int
    orientation: str = "paper"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        out = build_base_model(self.base_model, self.num_feature,
                               self.num_head, self.orientation)(
            x, mask, deterministic)
        out = x + out
        return dense(self.num_feature, name="fc1")(out)


class MultiAttention(nn.Module):
    """Global attention + per-segment local attentions. (encoder.py:26-59)

    Each of the ``num_segments`` contiguous chunks gets its own local
    attention; the chunk output is L2-normalized and added to the
    L2-normalized global path.  Segment boundaries use the bucket length
    (the reference uses the runtime length; identical when unpadded).
    """
    num_feature: int
    base_model: str
    orientation: str = "paper"
    num_segments: int = 5
    num_head: int = 8
    local_attention_head: int = 4

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        fc = dense(self.num_feature, name="fc")
        global_attn = build_base_model(
            self.base_model, self.num_feature, self.num_head,
            self.orientation, name="global_attention")
        weighted = nn.relu(fc(global_attn(x, mask, deterministic)))

        if self.num_segments is None:
            return weighted
        assert self.num_segments >= 2, "num_segments must be >= 2"

        n = x.shape[-2]
        segment_size = math.ceil(n / self.num_segments)
        pieces = []
        for seg in range(self.num_segments):
            lo = seg * segment_size
            hi = min((seg + 1) * segment_size, n)
            if lo >= hi:
                continue
            local_x = x[:, lo:hi, :]
            local_mask = None if mask is None else mask[:, lo:hi]
            local = build_base_model(
                self.base_model, self.num_feature,
                self.local_attention_head, self.orientation,
                name=f"local_attention_{seg}")(local_x, local_mask,
                                               deterministic)
            local_w = nn.relu(fc(local))
            combined = l2_normalize(weighted[:, lo:hi, :]) \
                + l2_normalize(local_w)
            pieces.append(combined)
        return jnp.concatenate(pieces, axis=1)


class LocalGlobalEncoder(nn.Module):
    """fc(LN(MultiAttention(x))). (encoder.py:63-71)"""
    base_model: str
    orientation: str
    num_feature: int
    num_head: int
    num_segments: int
    local_attention_head: int

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h = MultiAttention(self.num_feature, self.base_model,
                           self.orientation, self.num_segments,
                           self.num_head, self.local_attention_head,
                           name="multi_attention")(x, mask, deterministic)
        h = layer_norm(name="layer_norm")(h)
        return nn.relu(dense(self.num_feature, name="fc")(h))
