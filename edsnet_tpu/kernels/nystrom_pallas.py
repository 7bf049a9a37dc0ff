"""Fused Nystromformer attention as a single Pallas TPU kernel.

Computes, per (batch, head) grid cell, everything between the QKV
projection and the output projection of the Nystromformer block
(reference `src/transformer/nystroformer.py:95-133`): masked landmark
means, the three similarity softmaxes, the 6-step Newton-Schulz
pseudo-inverse of the (m x m) landmark kernel, and the final
``(attn1 @ pinv) @ (attn3 @ v)`` aggregation — entirely in VMEM, so none
of the (N x m) / (m x N) intermediates round-trip through HBM.

Inputs must already be masked and q pre-scaled (the flax module does
this); N must be a multiple of num_landmarks (the data pipeline's
bucket_size=64 guarantees it).

The jnp path in models/nystromformer.py is the reference implementation;
tests assert equivalence (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, num_landmarks: int,
            pinv_iterations: int, eps: float):
    q = q_ref[0, 0]            # [N, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mask = mask_ref[0]         # [N] float (1.0 valid / 0.0 pad)

    n, d = q.shape
    m = num_landmarks
    l = n // m

    counts = jnp.sum(mask.reshape(m, l), axis=1)              # [m]
    divisor = (counts + eps)[:, None]
    q_l = jnp.sum(q.reshape(m, l, d), axis=1) / divisor       # [m, D]
    k_l = jnp.sum(k.reshape(m, l, d), axis=1) / divisor

    pos_valid = mask > 0                                       # [N]
    lm_valid = counts > 0                                      # [m]

    sim1 = jnp.dot(q, k_l.T, preferred_element_type=jnp.float32)   # [N, m]
    sim2 = jnp.dot(q_l, k_l.T, preferred_element_type=jnp.float32)  # [m, m]
    sim3 = jnp.dot(q_l, k.T, preferred_element_type=jnp.float32)   # [m, N]

    sim1 = jnp.where(pos_valid[:, None] & lm_valid[None, :], sim1, NEG)
    sim2 = jnp.where(lm_valid[:, None] & lm_valid[None, :], sim2, NEG)
    sim3 = jnp.where(lm_valid[:, None] & pos_valid[None, :], sim3, NEG)

    attn1 = jax.nn.softmax(sim1, axis=-1)
    attn2 = jax.nn.softmax(sim2, axis=-1)
    attn3 = jax.nn.softmax(sim3, axis=-1)

    # Newton-Schulz pseudo-inverse of attn2 (nystroformer.py:13-28)
    col = jnp.sum(jnp.abs(attn2), axis=-1)
    row = jnp.sum(jnp.abs(attn2), axis=-2)
    z = attn2.T / (jnp.max(col) * jnp.max(row))
    eye = jnp.eye(m, dtype=attn2.dtype)

    def body(_, z):
        xz = jnp.dot(attn2, z, preferred_element_type=jnp.float32)
        inner = 7 * eye - xz
        inner = 15 * eye - jnp.dot(xz, inner,
                                   preferred_element_type=jnp.float32)
        inner = 13 * eye - jnp.dot(xz, inner,
                                   preferred_element_type=jnp.float32)
        return 0.25 * jnp.dot(z, inner, preferred_element_type=jnp.float32)

    z = jax.lax.fori_loop(0, pinv_iterations, body, z)

    av = jnp.dot(attn3, v, preferred_element_type=jnp.float32)      # [m, D]
    zav = jnp.dot(z, av, preferred_element_type=jnp.float32)        # [m, D]
    out_ref[0, 0] = jnp.dot(attn1, zav,
                            preferred_element_type=jnp.float32)     # [N, D]


def nystrom_attention_pallas(q, k, v, mask, num_landmarks: int = 64,
                             pinv_iterations: int = 6, eps: float = 1e-8,
                             interpret: bool = None):
    """Fused landmark attention.

    :param q: [B, H, N, D] pre-scaled, pre-masked queries.
    :param k: [B, H, N, D]; v likewise.
    :param mask: [B, N] validity (bool/float).
    :param interpret: force Pallas interpreter mode (auto-on off-TPU).
    :return: [B, H, N, D] attention output (before the values conv residual
        and output projection).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, n, d = q.shape
    assert n % num_landmarks == 0, (n, num_landmarks)
    maskf = jnp.asarray(mask, q.dtype)

    spec_qkv = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_mask = pl.BlockSpec((1, n), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, num_landmarks=num_landmarks,
                pinv_iterations=pinv_iterations, eps=eps),
        grid=(b, h),
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_mask],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, maskf)
