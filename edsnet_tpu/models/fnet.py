"""FNet / Fourier-mixing backbone (3 orientations).

Reference: `src/modules/frequency_inspired/fourier_attention.py`.
Orientations (fourier_attention.py:9-20):
- 'temporal':     Re(FFT over the time axis)
- 'feature_wise': Re(FFT over the channel axis)
- 'paper':        Re(FFT_time(FFT_channel(x)))  — the FNet formulation.

Length semantics: the reference FFTs the *exact* sequence length; a DFT
over the padded bucket is a different transform (spectra at different
lengths are not comparable).  With a mask we therefore build per-video
truncated-DFT twiddle matrices at the true length n — Re(DFT_n) is a
single (L, L) cos/sin matmul against the time axis, an MXU-friendly
contraction — so every real position matches the unpadded computation.
Rows at padded positions are garbage by construction; downstream heads
mask them.  The channel-axis FFT has a static length and keeps jnp.fft.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import apply_mask, dense, layer_norm

_TWO_PI = 6.283185307179586


def _dft_mats(lengths, n: int, dtype):
    """Per-video Re/Im parts of the truncated DFT_n matrix, padded to (L, L).

    lengths: [B] true lengths; returns (cos, sin) sized [B, L, L] with
    cos[b, j, k] = cos(2*pi*j*k / n_b) for j,k < n_b, else 0 (same for sin).
    The phase is reduced with an integer modulo before the float divide:
    j*k grows to L^2 and float32 cos() of large arguments would lose the
    precision the spectrum lives in.
    """
    j = jnp.arange(n, dtype=jnp.int32)
    jk = j[:, None] * j[None, :]                       # [L, L] int32
    lb = lengths.astype(jnp.int32)[:, None, None]      # [B, 1, 1]
    lb = jnp.maximum(lb, 1)  # fully-masked videos: avoid div/mod by zero
    phase = (jk[None] % lb).astype(dtype) * (_TWO_PI / lb.astype(dtype))
    valid = (j[None, :, None] < lb) & (j[None, None, :] < lb)
    cos = jnp.where(valid, jnp.cos(phase), 0.0)
    sin = jnp.where(valid, jnp.sin(phase), 0.0)
    return cos, sin


def fft_mix(x, orientation: str, mask=None):
    if orientation == "feature_wise":
        # static channel length: exact regardless of padding
        return jnp.fft.fft(x, axis=-1).real
    if orientation not in ("temporal", "paper"):
        raise ValueError(f"Invalid fft orientation {orientation}")

    if mask is None:
        if orientation == "temporal":
            return jnp.fft.fft(x, axis=-2).real
        return jnp.fft.fft(jnp.fft.fft(x, axis=-1), axis=-2).real

    b, n, f = x.shape
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
    cos, sin = _dft_mats(lengths, n, x.dtype)
    if orientation == "temporal":
        # x real: Re(DFT_n x) = cos @ x
        return jnp.einsum("bjk,bkf->bjf", cos, x)
    z = jnp.fft.fft(x, axis=-1)                        # channel FFT first
    # Re(DFT_n z) = cos @ Re(z) + sin @ Im(z)
    return jnp.einsum("bjk,bkf->bjf", cos, z.real) \
        + jnp.einsum("bjk,bkf->bjf", sin, z.imag)


class FNetLayer(nn.Module):
    """LN(fft + x) then LN(fc(x) + x). (fourier_attention.py:35-48)"""
    num_feature: int
    dropout: float = 0.5
    orientation: str = "paper"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        x = apply_mask(x, mask)
        mixed = fft_mix(x, self.orientation, mask)
        x = layer_norm(name="skip_norm")(mixed + x)
        h = dense(self.num_feature, name="fc")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return layer_norm(name="out_norm")(h + x)


class FNetModel(nn.Module):
    """Stacked (weight-shared) FNet layers + dense head. (fourier_attention.py:50-64)

    The reference appends the *same* layer module num_layers times
    (fourier_attention.py:59), i.e. weights are shared — reproduced here.
    """
    num_feature: int
    dropout: float = 0.5
    num_layers: int = 2
    orientation: str = "paper"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        layer = FNetLayer(self.num_feature, self.dropout, self.orientation,
                          name="fnet_layer")
        for _ in range(self.num_layers):
            x = layer(x, mask, deterministic)
        h = dense(self.num_feature, name="dense")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return layer_norm(name="dense_norm")(h)
