"""Shared model utilities: init schemes, masked primitives.

Init matches the reference trainer's post-construction re-init
(`src/anchor_based/train.py:19-24`): xavier-uniform with gain sqrt(2) on
every Linear/Conv kernel, constant 0.1 bias.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# xavier_uniform(gain=sqrt(2)): limit = sqrt(2) * sqrt(6 / (fan_in + fan_out))
# == variance_scaling(scale=2, fan_avg, uniform).
XAVIER2 = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")
BIAS01 = nn.initializers.constant(0.1)


def dense(features: int, use_bias: bool = True, name: Optional[str] = None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=XAVIER2,
                    bias_init=BIAS01, name=name)


def layer_norm(name: Optional[str] = None):
    """torch ``nn.LayerNorm`` twin: eps 1e-5 (flax defaults to 1e-6).

    Verified bitwise-relevant by tests/parity — the eps gap is visible at
    the 1e-5 tolerance the cross-framework harness asserts.
    """
    return nn.LayerNorm(epsilon=1e-5, name=name)


def gelu(x):
    """torch ``nn.GELU()`` twin: exact erf form (flax defaults to tanh)."""
    return nn.gelu(x, approximate=False)


def masked_softmax(logits, mask=None, axis: int = -1):
    """Softmax with an optional boolean mask (False = excluded)."""
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    return nn.softmax(logits, axis=axis)


def apply_mask(x, mask=None):
    """Zero features at invalid positions. x: [..., N, F]; mask: [..., N]."""
    if mask is None:
        return x
    return x * mask[..., None].astype(x.dtype)


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """torch F.normalize(p=2) equivalent.

    Double-where keeps gradients finite for all-zero rows (a dead-relu
    row upstream): norm's derivative at 0 is inf, and even a zero
    cotangent routed through a plain maximum turns that into NaN.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    safe = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return x / jnp.maximum(jnp.where(sq > 0, safe, 0.0), eps)


class FcBlock(nn.Module):
    """Linear -> ReLU -> Dropout(0.5) -> LayerNorm, the reference fc_block.

    (src/anchor_based/dsnet.py:91-95; weights are *shared* across fc_depth
    repeats in the reference — callers apply one instance repeatedly.)
    """
    num_hidden: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = dense(self.num_hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return layer_norm()(x)
