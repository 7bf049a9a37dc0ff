"""Fused Nystromformer attention as a Pallas TPU kernel.

Fuses the compute-dense middle of the Nystromformer block (reference
`src/transformer/nystroformer.py:115-133`): the three similarity matmuls +
masked softmaxes, the 6-step Newton-Schulz pseudo-inverse of the (m x m)
landmark kernel, and the ``(attn1 @ pinv) @ (attn3 @ v)`` aggregation — all
per (batch, head) grid cell in VMEM, so the (N x m)/(m x m)/(m x N)
intermediates never round-trip through HBM.

Mosaic constraints shape the decomposition:
- landmark mean-pooling needs an (N,) -> (m, l) cross-lane reshape, which
  Mosaic does not lower; the (cheap, bandwidth-bound) landmark sums are
  computed outside and passed in.
- masks arrive as broadcast-ready row/col tensors ((B, X, 1) / (B, 1, X))
  so the kernel never reshapes vectors across lanes.

The jnp path in models/nystromformer.py is the reference implementation;
tests assert equivalence (interpret mode on CPU, compiled on TPU).

Measured on TPU v5e-1 at the paper config (B=8, H=8, N=512, D=64):
XLA path 0.021 ms/step vs this kernel 0.035 ms/step — at EDSNet's model
sizes XLA's fusion is already near speed-of-light and parallelizes better
across (batch, head) than a per-cell grid, so the XLA path is the default
and the kernel is opt-in (``--use-pallas``) infrastructure for larger-N
regimes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, ql_ref, kl_ref, pos_row_ref, pos_col_ref,
            lm_row_ref, lm_col_ref, out_ref, *, pinv_iterations: int):
    q = q_ref[0, 0]            # [N, D] (pre-masked, pre-scaled)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    q_l = ql_ref[0, 0]         # [m, D] landmark means
    k_l = kl_ref[0, 0]
    pos_row = pos_row_ref[0] > 0   # [N, 1]
    pos_col = pos_col_ref[0] > 0   # [1, N]
    lm_row = lm_row_ref[0] > 0     # [m, 1]
    lm_col = lm_col_ref[0] > 0     # [1, m]
    m = q_l.shape[0]

    sim1 = jnp.dot(q, k_l.T, preferred_element_type=jnp.float32)    # [N, m]
    sim2 = jnp.dot(q_l, k_l.T, preferred_element_type=jnp.float32)  # [m, m]
    sim3 = jnp.dot(q_l, k.T, preferred_element_type=jnp.float32)    # [m, N]

    sim1 = jnp.where(pos_row & lm_col, sim1, NEG)
    sim2 = jnp.where(lm_row & lm_col, sim2, NEG)
    sim3 = jnp.where(lm_row & pos_col, sim3, NEG)

    attn1 = jax.nn.softmax(sim1, axis=-1)
    attn2 = jax.nn.softmax(sim2, axis=-1)
    attn3 = jax.nn.softmax(sim3, axis=-1)

    # Newton-Schulz pseudo-inverse of attn2 (nystroformer.py:13-28)
    col = jnp.max(jnp.sum(jnp.abs(attn2), axis=-1))
    row = jnp.max(jnp.sum(jnp.abs(attn2), axis=-2))
    z = attn2.T / (col * row)
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
    m = num_landmarks
    assert n % m == 0, (n, m)
    l = n // m
    maskf = jnp.asarray(mask, q.dtype)

    # landmark sums / masked means (bandwidth-bound; fused by XLA)
    counts = maskf.reshape(b, m, l).sum(axis=-1)                  # [B, m]
    divisor = (counts + eps)[:, None, :, None]
    q_l = q.reshape(b, h, m, l, d).sum(axis=3) / divisor
    k_l = k.reshape(b, h, m, l, d).sum(axis=3) / divisor

    pos_row = maskf[:, :, None]                                   # [B, N, 1]
    pos_col = maskf[:, None, :]                                   # [B, 1, N]
    lm = (counts > 0).astype(q.dtype)
    lm_row = lm[:, :, None]                                       # [B, m, 1]
    lm_col = lm[:, None, :]                                       # [B, 1, m]

    def qkv_spec(rows):
        return pl.BlockSpec((1, 1, rows, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def mask_spec(r, c):
        return pl.BlockSpec((1, r, c), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, pinv_iterations=pinv_iterations),
        grid=(b, h),
        in_specs=[qkv_spec(n), qkv_spec(n), qkv_spec(n),
                  qkv_spec(m), qkv_spec(m),
                  mask_spec(n, 1), mask_spec(1, n),
                  mask_spec(m, 1), mask_spec(1, m)],
        out_specs=qkv_spec(n),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, q_l, k_l, pos_row, pos_col, lm_row, lm_col)
