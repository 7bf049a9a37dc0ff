"""Windowed linear pooling — the MXU-native core of the EDSNet poolings.

Observation: every EDSNet pooling variant (reference
`src/anchor_based/poolings.py`) is a *linear* functional of the sliding
window slots w_j(i) = x[r_ij]:

- flat fine:  fc(flatten(w))            = sum_j W_j^T w_j
- fft  fine:  fc(flatten(Re(FFT(w))))   = sum_j (sum_k cos(2*pi*k*j/s) W_k)^T w_j
- fft  coarse: mean_k Re(FFT(w))_k      = w_0            (DC average identity)
- dwt  fine:  fc(flatten(cA(w)))        = sum_j (W_{j//2} / sqrt(2))^T w_j
- dwt  coarse: mean_k cA_k              = sum_j w_j / (sqrt(2) * s/2)

so all of them reduce to  out[i] = sum_j A_j^T x[r_ij] + b  with a
per-variant weight fold.  On TPU this is a size-s 1-D convolution (one MXU
contraction, no (B, N, s, H) window materialization in HBM) plus an exact
fix-up of the reference's left-edge window shift (windows are clamped to
start >= 0 and zero-padded *at the end*, poolings.py:22-27).

The gather-based formulation in models/poolings.py remains as the tested
reference implementation; tests assert bitwise-close equivalence.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def fft_weight_fold(w_flat: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Fold the window-FFT into fc weights: W~_j = sum_k cos(2 pi k j / s) W_k.

    :param w_flat: [s*H, O] fc kernel over the flattened (k, H) spectrum.
    :return: [s, H, O] folded slot weights.
    """
    sh, o = w_flat.shape
    h = sh // scale
    w = w_flat.reshape(scale, h, o)
    k = np.arange(scale)[:, None]
    j = np.arange(scale)[None, :]
    cos = jnp.asarray(np.cos(2 * np.pi * k * j / scale), w.dtype)
    return jnp.einsum("kj,kho->jho", cos, w)


def dwt_weight_fold(w_flat: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Fold the window-Haar-cA into fc weights: W~_j = W_{j//2} / sqrt(2).

    :param w_flat: [(s//2)*H, O] fc kernel over the flattened cA.
    :return: [s, H, O] folded slot weights.
    """
    half = scale // 2
    sh, o = w_flat.shape
    h = sh // half
    w = w_flat.reshape(half, h, o) / math.sqrt(2.0)
    return jnp.repeat(w, 2, axis=0)


def flat_weight_fold(w_flat: jnp.ndarray, scale: int) -> jnp.ndarray:
    sh, o = w_flat.shape
    h = sh // scale
    return w_flat.reshape(scale, h, o)


def windowed_linear(x: jnp.ndarray, slot_weights: jnp.ndarray,
                    bias=None) -> jnp.ndarray:
    """out[i] = sum_j slot_weights[j]^T x[r_ij] (+ bias), reference windows.

    r_ij = max(0, i - s//2 + 1) + j, slots past min(i + s//2, N-1) are zero
    (poolings.py:22-27).  Interior rows lower to one conv contraction;
    the first (s//2 - 1) rows get the exact clamped-window fix-up.

    :param x: [B, N, H] (padded positions must be zero).
    :param slot_weights: [s, H, O].
    :return: [B, N, O]
    """
    b, n, h = x.shape
    s, _, o = slot_weights.shape
    off = s // 2 - 1  # left reach of the interior window

    # interior: y[i] = sum_j x_pad[i - off + j] @ A_j  == conv1d
    # conv 'SAME'-style padding: pad_left = off, pad_right = s - 1 - off
    y = jax.lax.conv_general_dilated(
        x, slot_weights,
        window_strides=(1,),
        padding=((max(off, 0), s - 1 - off),),
        dimension_numbers=("NHC", "HIO", "NHC"))

    if off > 0:
        # exact left-boundary windows: out_i = sum_{j <= i + s//2} A_j x[j]
        # (fix-up region clamped to n: a sequence shorter than the left
        # reach would otherwise write an [B, off, O] block into n < off
        # rows)
        off_eff = min(off, n)
        head = x[:, :min(s, n), :]                          # [B, <=s, H]
        terms = jnp.einsum("bjh,jho->bjo", head,
                           slot_weights[:head.shape[1]])    # [B, <=s, O]
        prefix = jnp.cumsum(terms, axis=1)                  # P_m
        last = jnp.minimum(jnp.arange(off_eff) + s // 2, n - 1)
        last = jnp.minimum(last, head.shape[1] - 1)
        fix = prefix[:, last, :]                            # [B, off_eff, O]
        y = y.at[:, :off_eff, :].set(fix)

    if bias is not None:
        y = y + bias
    return y


def fft_coarse(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """mean over the window of Re(FFT(window)) == the window's first slot:
    x[max(0, i - s//2 + 1)] (DC identity; see module docstring)."""
    b, n, h = x.shape
    start = jnp.maximum(0, jnp.arange(n) - scale // 2 + 1)
    return x[:, start, :]


def windowed_sum(x: jnp.ndarray, coeffs) -> jnp.ndarray:
    """out[i] = sum_j coeffs[j] * x[r_ij], same window semantics as
    ``windowed_linear`` but without the feature contraction (VPU-only)."""
    b, n, h = x.shape
    coeffs = jnp.asarray(coeffs, x.dtype)
    s = coeffs.shape[0]
    off = s // 2 - 1
    xp = jnp.pad(x, ((0, 0), (max(off, 0), s - 1 - off), (0, 0)))
    y = sum(coeffs[j] * xp[:, j:j + n, :] for j in range(s))
    if off > 0:
        off_eff = min(off, n)   # same short-sequence clamp as above
        head = x[:, :min(s, n), :]
        terms = coeffs[:head.shape[1], None] * head
        prefix = jnp.cumsum(terms, axis=1)
        last = jnp.minimum(jnp.arange(off_eff) + s // 2, n - 1)
        last = jnp.minimum(last, head.shape[1] - 1)
        y = y.at[:, :off_eff, :].set(prefix[:, last, :])
    return y


def dwt_coarse(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """mean over cA coefficients: sum_j w_j / (sqrt(2) * (s/2))."""
    c = jnp.full((scale,), 1.0 / (math.sqrt(2.0) * (scale // 2)), x.dtype)
    return windowed_sum(x, c)
