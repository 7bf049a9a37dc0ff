"""EDSNet region poolings: ROI (multi-scale avg) and flat / FFT / DWT windows.

Reference: `src/anchor_based/poolings.py` and the AvgPool1d ROI branches in
`src/anchor_based/dsnet.py:78-80,110-115`.

The reference computes flat/FFT/DWT poolings with a *per-position Python
loop* that round-trips windows through pywt on the CPU (poolings.py:18-67) —
O(N) host<->device transfers per forward.  Here each pooling is one gather
of all sliding windows into a (B, N, scale, H) tensor followed by a batched
FFT/Haar/flatten + fc: a single fused XLA program (and a Pallas-fusable hot
op).

Window semantics replicated exactly (poolings.py:22-27): window i covers
positions [max(0, i - s//2 + 1), min(i + s//2, N-1)], truncated windows are
zero-padded *at the end* of the window.  With zero-padded length buckets the
padded positions land in the same window slots as the reference's pad,
so bucketed outputs equal unpadded ones at every real position.

ROI average pooling (AvgPool1d(scale, stride=1, padding=scale//2) with
count_include_pad): out[i] = mean over [i - s//2, i - s//2 + s - 1] with
zeros outside, divisor always ``scale`` — implemented with prefix sums.
(For odd scales the reference's `[:-1]` crop yields a length mismatch and
crashes; we define the natural centered window instead.)
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import BIAS01, XAVIER2, gelu
from edsnet_tpu.ops import window_linear as wl
from edsnet_tpu.ops.dwt import haar_dwt


def extract_windows(x, scale: int):
    """(B, N, H) -> (B, N, scale, H) sliding windows, reference-padded."""
    b, n, h = x.shape
    i = jnp.arange(n)
    start = jnp.maximum(0, i - scale // 2 + 1)
    last = jnp.minimum(i + scale // 2, n - 1)
    idx = start[:, None] + jnp.arange(scale)[None, :]          # [N, s]
    valid = idx <= last[:, None]
    gathered = x[:, jnp.clip(idx, 0, n - 1), :]                # [B, N, s, H]
    return gathered * valid[None, :, :, None].astype(x.dtype)


def roi_avg_pool(x, scale: int):
    """(B, N, H) -> (B, N, H) stride-1 avg pool, zero padded, divisor=scale."""
    b, n, h = x.shape
    pad = jnp.zeros((b, scale, h), x.dtype)
    cs = jnp.cumsum(jnp.concatenate([pad, x, pad], axis=1), axis=1)
    cs = jnp.concatenate([jnp.zeros((b, 1, h), x.dtype), cs], axis=1)
    # window for position i: [i - s//2, i - s//2 + s - 1] in x coords
    # = [i - s//2 + s, i + s//2 + s? ] in padded coords offset by `scale`
    lo = jnp.arange(n) - scale // 2 + scale
    window_sum = cs[:, lo + scale, :] - cs[:, lo, :]
    return window_sum / jnp.asarray(scale, x.dtype)


def roi_multi_scale(x, scales: Sequence[int]):
    """(B, N, H) -> (B, N, S, H) ROI pooling at each anchor scale."""
    outs = [roi_avg_pool(x, s) for s in scales]
    return jnp.stack(outs, axis=2)


class Pooling(nn.Module):
    """flat / fft / dwt window pooling. (poolings.py:8-81)

    Single scale = scales[0] like the reference (poolings.py:11).
    - 'fft':  coarse = mean over window of Re(FFT(window));
              fine = fc(flatten(Re(FFT(window)))) + GELU
    - 'dwt':  coarse = mean over cA; fine = fc(flatten(cA)) + GELU
    - 'flat-pooling': fine = fc(flatten(window)) + GELU (no coarse)

    ``fused=True`` (default) lowers each variant to a windowed *linear* map
    — one MXU conv contraction with folded weights, no (B, N, s, H)
    materialization (see ops/window_linear.py); ``fused=False`` keeps the
    literal gather-windows formulation (test oracle).
    """
    scales: Sequence[int]
    pooling_type: str
    num_hidden: int
    fused: bool = True
    # False: skip the coarse tensor (the fused head computes its cls
    # projection commuted past the linear coarse map itself —
    # _AnchorHeads.fused_linear_coarse); param tree is identical
    emit_coarse: bool = True

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        scale = list(self.scales)[0]
        if self.pooling_type == "dwt" and scale % 2:
            # the Haar fold pairs window positions; fc_kernel is sized
            # (scale//2)*H while an odd window yields ceil(scale/2) slots
            # (the reference's .view() rejects odd windows the hard way,
            # poolings.py:33)
            raise ValueError(f"dwt pooling needs an even --anchor-scales "
                             f"window, got {scale}")
        b, n, h = x.shape
        in_dim = (scale // 2 if self.pooling_type == "dwt" else scale) * h
        kernel = self.param("fc_kernel", XAVIER2, (in_dim, self.num_hidden))
        bias = self.param("fc_bias", BIAS01, (self.num_hidden,))

        if self.fused:
            if self.pooling_type == "fft":
                folded = wl.fft_weight_fold(kernel, scale)
                coarse = (wl.fft_coarse(x, scale)
                          if self.emit_coarse else None)
            elif self.pooling_type == "dwt":
                folded = wl.dwt_weight_fold(kernel, scale)
                coarse = (wl.dwt_coarse(x, scale)
                          if self.emit_coarse else None)
            elif self.pooling_type == "flat-pooling":
                folded = wl.flat_weight_fold(kernel, scale)
                coarse = None
            else:
                raise ValueError(
                    f"Invalid pooling type {self.pooling_type}")
            fine = gelu(wl.windowed_linear(x, folded, bias))
            return (fine,) if coarse is None else (coarse, fine)

        w = extract_windows(x, scale)                  # [B, N, s, H]
        if self.pooling_type == "fft":
            spec = jnp.fft.fft(w, axis=2).real
            coarse = spec.mean(axis=2)
            fine = spec.reshape(b, n, scale * h) @ kernel + bias
            return (gelu(fine),) if not self.emit_coarse \
                else (coarse, gelu(fine))
        if self.pooling_type == "dwt":
            ca, _ = haar_dwt(w, axis=2)                # [B, N, s//2, H]
            coarse = ca.mean(axis=2)
            fine = ca.reshape(b, n, (scale // 2) * h) @ kernel + bias
            return (gelu(fine),) if not self.emit_coarse \
                else (coarse, gelu(fine))
        if self.pooling_type == "flat-pooling":
            fine = w.reshape(b, n, scale * h) @ kernel + bias
            return (gelu(fine),)
        raise ValueError(f"Invalid pooling type {self.pooling_type}")
