"""DWT token-mixing backbone — on-device, differentiable Haar transform.

Reference: `src/modules/frequency_inspired/dwt_attention.py` round-trips to
pywt on the host (`.cpu().detach().numpy()`, dwt_attention.py:13), which
breaks gradients and device residency; here the Haar DWT is a strided jnp op
(see edsnet_tpu/ops/dwt.py) so the whole block jits and backprops.

Structure (dwt_attention.py:28-39): cA, cD = DWT(x); h = fc(cA);
h = LN(h + cD); upsample time 2x with a learned 2-tap transposed conv
(in/out channels 1, i.e. one shared (w0, w1, bias)); crop to seq_len;
fc again (the *same* fc weights — the reference reuses self.fc).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import BIAS01, XAVIER2, apply_mask, dense, gelu, layer_norm
from edsnet_tpu.ops.dwt import haar_dwt


class DwtNet(nn.Module):
    num_feature: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, n, f = x.shape
        x = apply_mask(x, mask)

        fc = dense(self.num_feature, name="fc")

        def fc_block(t, det):
            t = fc(t)
            t = gelu(t)
            return nn.Dropout(self.dropout)(t, deterministic=det)

        ca, cd = haar_dwt(x, axis=1)          # [B, ceil(N/2), F]
        if mask is not None:
            # exact pywt symmetric-boundary semantics at the true length:
            # for odd n the last real pair is (x[n-1], x[n-1]) ->
            # cA = sqrt(2) * x[n-1], cD = 0, whereas the zero-padded bucket
            # computed (x[n-1] + 0) / sqrt(2).  Coefficients strictly inside
            # the true length are pad-independent, so only this one slot
            # needs patching (dwt_attention.py:13, pywt mode='symmetric').
            lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)   # [B]
            even_pos = jnp.arange(ca.shape[1]) * 2               # [M]
            boundary = (even_pos[None, :] == lengths[:, None] - 1)
            even_vals = x[:, 0::2, :]
            ca = jnp.where(boundary[..., None],
                           even_vals * jnp.asarray(2.0 ** 0.5, x.dtype), ca)
            cd = jnp.where(boundary[..., None], 0.0, cd)
        h = fc_block(ca, deterministic)
        h = layer_norm(name="norm")(h + cd)

        # ConvTranspose1d(1, 1, kernel=2, stride=2): out[2i] = w0*h[i]+b,
        # out[2i+1] = w1*h[i]+b (dwt_attention.py:25,33)
        w = self.param("transconv_kernel", XAVIER2, (2, 1, 1))
        bias = self.param("transconv_bias", BIAS01, (1,))
        up = jnp.stack([h * w[0, 0, 0], h * w[1, 0, 0]], axis=2)
        up = up.reshape(b, -1, f) + bias[0]
        up = up[:, :n, :]

        return fc_block(up, deterministic)
