"""FNet / Fourier-mixing backbone (3 orientations).

Reference: `src/modules/frequency_inspired/fourier_attention.py`.
Orientations (fourier_attention.py:9-20):
- 'temporal':     Re(FFT over the time axis)
- 'feature_wise': Re(FFT over the channel axis)
- 'paper':        Re(FFT_time(FFT_channel(x)))  — the FNet formulation.

Masking: the FFT over time on a padded bucket sees trailing zeros; zeros
contribute nothing to the DFT sums, so the spectrum equals that of the
zero-extended real sequence (the reference FFTs the exact length; spectra
at different lengths are not comparable bitwise — documented deviation,
bucketing keeps the gap small).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import apply_mask, dense, layer_norm


def fft_mix(x, orientation: str):
    if orientation == "temporal":
        return jnp.fft.fft(x, axis=-2).real
    if orientation == "feature_wise":
        return jnp.fft.fft(x, axis=-1).real
    if orientation == "paper":
        return jnp.fft.fft(jnp.fft.fft(x, axis=-1), axis=-2).real
    raise ValueError(f"Invalid fft orientation {orientation}")


class FNetLayer(nn.Module):
    """LN(fft + x) then LN(fc(x) + x). (fourier_attention.py:35-48)"""
    num_feature: int
    dropout: float = 0.5
    orientation: str = "paper"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        x = apply_mask(x, mask)
        mixed = fft_mix(x, self.orientation)
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
