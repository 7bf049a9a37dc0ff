"""Performer (FAVOR+) backbone: O(N) softmax-kernel linear attention.

Reference: `src/transformer/performer.py` — itself a torch transcription of
Google's *JAX* fast attention (performer.py:46-47), so this implementation
is essentially the algorithm coming home.  Factory config
(`src/modules/models.py:141`): dim=1024, depth=1, heads=num_head,
dim_head=64, mlp_dim=1024, dropout=0.5 (FF), attn dropout 0, qkv bias.

The orthogonal gaussian random feature matrix is drawn once at init into a
non-trainable ``constants`` collection (the reference registers it as a
buffer and never redraws during training — ProjectionUpdater exists but is
unused by the Performer wrapper).

Masking: feature-mapped keys and values are zeroed at invalid positions, so
both the numerator contraction and the D normalizer see only real frames —
padded buckets match unpadded computation exactly.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import XAVIER2, BIAS01, dense, gelu, layer_norm


def orthogonal_gaussian(rng, nb_rows: int, nb_cols: int, scaling: int = 0):
    """Gaussian orthogonal random features via blockwise QR. (performer.py:92-121)"""
    blocks = []
    n_full = nb_rows // nb_cols
    rngs = jax.random.split(rng, n_full + 2)
    for i in range(n_full):
        g = jax.random.normal(rngs[i], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_cols
    if rem > 0:
        g = jax.random.normal(rngs[n_full], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    final = jnp.concatenate(blocks, axis=0)
    if scaling == 0:
        mult = jnp.linalg.norm(
            jax.random.normal(rngs[n_full + 1], (nb_rows, nb_cols)), axis=1)
    elif scaling == 1:
        mult = math.sqrt(float(nb_cols)) * jnp.ones((nb_rows,))
    else:
        raise ValueError(f"Invalid scaling {scaling}")
    return mult[:, None] * final


def softmax_kernel(data, projection, is_query: bool, normalize_data=True,
                   eps: float = 1e-4, mask=None):
    """FAVOR+ positive softmax features. (performer.py:49-74)

    The key stabilizer is the max over THIS video's valid positions
    (per batch element), not the reference's global ``data_dash.max()``:
    a global max couples videos across the batch and lets padded rows
    shift real outputs through the ``+ eps`` term (an outlier co-batched
    video can push every exp() below eps, degrading attention toward a
    uniform average).  For a single unpadded video the two are identical,
    which is what the cross-framework parity test pins.
    """
    normalizer = (data.shape[-1] ** -0.25) if normalize_data else 1.0
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum("...id,jd->...ij", normalizer * data, projection)
    diag = jnp.sum(data ** 2, axis=-1) * 0.5 * (normalizer ** 2)
    diag = diag[..., None]
    if is_query:
        stab = jnp.max(data_dash, axis=-1, keepdims=True)
    else:
        masked = data_dash if mask is None else jnp.where(
            mask[:, None, :, None], data_dash, -jnp.inf)
        stab = jnp.max(masked, axis=tuple(range(1, data_dash.ndim)),
                       keepdims=True)
        # all-padding rows (batch fill videos) have no valid position
        stab = jnp.where(jnp.isfinite(stab), stab, 0.0)
    return ratio * (jnp.exp(data_dash - diag - stab) + eps)


def linear_attention(q, k, v, mask=None):
    """Non-causal O(N) attention. (performer.py:126-132), mask-aware."""
    if mask is not None:
        mf = mask[:, None, :, None].astype(q.dtype)
        k = k * mf
        v = v * mf
    k_cumsum = jnp.sum(k, axis=-2)
    d_inv = 1.0 / jnp.maximum(
        jnp.einsum("...nd,...d->...n", q, k_cumsum), 1e-12)
    context = jnp.einsum("...nd,...ne->...de", k, v)
    return jnp.einsum("...de,...nd,...n->...ne", context, q, d_inv)


class FastSelfAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    nb_features: Optional[int] = None
    qkv_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, n, _ = x.shape
        h = self.heads
        nb_features = self.nb_features or int(
            self.dim_head * math.log(self.dim_head))
        inner = h * self.dim_head

        projection = self.variable(
            "constants", "projection",
            lambda: orthogonal_gaussian(
                self.make_rng("params") if self.is_initializing()
                else jax.random.PRNGKey(0),
                nb_features, self.dim_head)).value

        def proj(name):
            t = nn.Dense(inner, use_bias=self.qkv_bias, kernel_init=XAVIER2,
                         bias_init=BIAS01, name=name)(x)
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = proj("to_q"), proj("to_k"), proj("to_v")
        q = softmax_kernel(q, projection, is_query=True)
        k = softmax_kernel(k, projection, is_query=False, mask=mask)
        out = linear_attention(q, k, v, mask)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class Performer(nn.Module):
    """PreNorm(attn) + PreNorm(FF) residual block stack. (performer.py:329-352)"""
    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        for i in range(self.depth):
            a = layer_norm(name=f"attn_norm_{i}")(x)
            a = FastSelfAttention(self.dim, self.heads, self.dim_head,
                                  name=f"attn_{i}")(a, mask, deterministic)
            x = a + x
            f = layer_norm(name=f"ff_norm_{i}")(x)
            f = dense(self.mlp_dim, name=f"ff1_{i}")(f)
            f = gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = dense(self.dim, name=f"ff2_{i}")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = f + x
        return x
