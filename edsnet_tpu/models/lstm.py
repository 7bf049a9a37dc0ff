"""LSTM / BiLSTM backbones (flax nn.RNN over lax.scan cells).

Reference: `src/modules/models.py:108-114,126-129` (thin nn.LSTM wrappers;
lstm maps F->F, bilstm maps F->F/2 per direction concatenated).

Masking: ``seq_lengths`` freezes the carry beyond each video's length and
the backward direction flips within the true length, so padded buckets are
bit-identical to unpadded execution; outputs at padded steps are zeroed.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def _lengths(mask, b, n):
    if mask is None:
        return jnp.full((b,), n, jnp.int32)
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


class LSTMExtractor(nn.Module):
    """(B, N, F) -> (B, N, hidden) unidirectional LSTM."""
    num_feature: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, n, _ = x.shape
        hidden = self.hidden or self.num_feature
        ys = nn.RNN(nn.OptimizedLSTMCell(hidden), unroll=8, name="fwd")(
            x, seq_lengths=_lengths(mask, b, n))
        if mask is not None:
            ys = ys * mask[..., None].astype(ys.dtype)
        return ys


class BiLSTMExtractor(nn.Module):
    """(B, N, F) -> (B, N, F): F/2 per direction, concatenated."""
    num_feature: int

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, n, _ = x.shape
        if self.num_feature % 2:
            raise ValueError(f"bilstm needs an even num_feature, got "
                             f"{self.num_feature} (F/2 per direction "
                             f"concatenated back to F)")
        hidden = self.num_feature // 2
        lengths = _lengths(mask, b, n)
        fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), unroll=8, name="fwd")(
            x, seq_lengths=lengths)
        bwd = nn.RNN(nn.OptimizedLSTMCell(hidden), unroll=8, name="bwd")(
            x, seq_lengths=lengths, reverse=True, keep_order=True)
        ys = jnp.concatenate([fwd, bwd], axis=-1)
        if mask is not None:
            ys = ys * mask[..., None].astype(ys.dtype)
        return ys
