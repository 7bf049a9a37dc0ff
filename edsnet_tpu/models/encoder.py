"""Encoder combinators: Classic, MultiAttention (local+global), LocalGlobal.

Reference: `src/modules/encoder.py`.  ``ClassicEncoder.forward`` at HEAD uses
``out`` before assignment (encoder.py:17-20, a NameError); we implement the
evident intent: residual around the base model, then fc.
"""
from __future__ import annotations

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
    L2-normalized global path.

    Length semantics match the reference exactly: segment boundaries come
    from the *true* per-video length (``ceil(n / num_segments)``,
    encoder.py:46), not the bucket length.  Since true lengths vary inside
    a padded batch, each video's segment s is gathered into a
    segment-aligned buffer (start shifted to 0, zero-padded, masked), run
    through that segment's module, and scattered back — so every base
    model, including position-dependent ones (LSTM state, DWT pairing,
    true-length DFT), sees exactly the slice the reference would.
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

        b, n, f = x.shape
        n_seg = self.num_segments
        if mask is None:
            lengths = jnp.full((b,), n, jnp.int32)
        else:
            lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
        seg_size = -(-lengths // n_seg)                # ceil, per video [B]
        buf = -(-n // n_seg)                           # static buffer length
        t = jnp.arange(buf)
        pos = jnp.arange(n)

        out = weighted
        for seg in range(n_seg):
            start = seg * seg_size                     # [B]
            end = jnp.minimum((seg + 1) * seg_size, lengths)
            idx = start[:, None] + t[None, :]          # [B, buf]
            seg_valid = idx < end[:, None]
            seg_x = jnp.take_along_axis(
                x, jnp.clip(idx, 0, n - 1)[..., None], axis=1)
            seg_x = seg_x * seg_valid[..., None].astype(x.dtype)
            local = build_base_model(
                self.base_model, self.num_feature,
                self.local_attention_head, self.orientation,
                name=f"local_attention_{seg}")(seg_x, seg_valid,
                                               deterministic)
            local_w = nn.relu(fc(local))
            # scatter back: global position j maps to local slot j - start
            rel = pos[None, :] - start[:, None]        # [B, n]
            in_seg = (rel >= 0) & (pos[None, :] < end[:, None])
            back = jnp.take_along_axis(
                local_w, jnp.clip(rel, 0, buf - 1)[..., None], axis=1)
            combined = l2_normalize(weighted) + l2_normalize(back)
            out = jnp.where(in_seg[..., None], combined, out)
        return out


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
