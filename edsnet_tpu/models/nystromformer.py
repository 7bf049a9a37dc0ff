"""Nystromformer attention backbone (the paper's headline encoder).

Reference: `src/transformer/nystroformer.py:32-150` — landmark mean pooling,
three softmax similarities, a 6-step Newton–Schulz pseudo-inverse of the
(m x m) landmark kernel, and a depthwise conv residual over values.  Default
config from the factory (`src/modules/models.py:135`): dim_head=64,
num_landmarks=64, pinv_iterations=6, residual conv kernel 33, dropout 0.

TPU notes: the core (between QKV and the output projection) is exposed as
``nystrom_core_jnp``.  A fused Pallas twin existed in round 1 and was
retired in round 2: XLA's fusion beat it at every feasible size (0.021 vs
0.035 ms at paper shapes, 0.61 vs 0.82 ms at N=4096 — see DESIGN.md);
the repo's Pallas effort moved to flash attention for the vanilla
backbone (kernels/flash_attention.py), where the roofline argument
actually favors a hand-written kernel.  We adopt the reference's *masked*
semantics (nystroformer.py:87-126) for padded buckets.  The reference's
internal front-padding (to a multiple of num_landmarks) is a no-op when
the bucket length is already a multiple of 64, which the data pipeline
guarantees.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import XAVIER2, BIAS01

NEG = -1e30


def moore_penrose_pinv(x, iters: int = 6, global_init: bool = False):
    """Newton–Schulz iterative pseudo-inverse. (nystroformer.py:13-28)

    Deviation: the z0 scaling uses per-matrix (batch, head) maxima of the
    column/row sums, where the reference takes the *global* max across the
    whole batch (an einops artifact at nystroformer.py:19).  Both are valid
    NS initializations converging to the same pseudo-inverse; per-matrix
    conditioning is tighter and matches the fused Pallas kernel exactly.
    ``global_init=True`` reproduces the reference's global-max z0 bitwise
    (used by the cross-framework parity harness in tests/parity/).
    """
    abs_x = jnp.abs(x)
    if global_init:
        col = jnp.max(jnp.sum(abs_x, axis=-1))
        row = jnp.max(jnp.sum(abs_x, axis=-2))
        z = jnp.swapaxes(x, -1, -2) / (col * row)
    else:
        col = jnp.max(jnp.sum(abs_x, axis=-1), axis=-1, keepdims=True)
        row = jnp.max(jnp.sum(abs_x, axis=-2), axis=-1, keepdims=True)
        z = jnp.swapaxes(x, -1, -2) / (col * row)[..., None]

    eye = jnp.eye(x.shape[-1], dtype=x.dtype)

    def body(z, _):
        xz = x @ z
        z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))
        return z, None

    z, _ = jax.lax.scan(body, z, None, length=iters)
    return z


def nystrom_core_jnp(q, k, v, mask, num_landmarks: int,
                     pinv_iterations: int, eps: float = 1e-8,
                     pinv_global_init: bool = False):
    """Landmark attention core. q/k/v: [B, H, N, D] (masked, q scaled);
    mask: [B, N] or None. Returns [B, H, N, D]."""
    b, h, n_p, d = q.shape
    m = num_landmarks
    l = n_p // m

    def landmarks(t):
        return t.reshape(b, h, m, l, d).sum(axis=3)

    q_l, k_l = landmarks(q), landmarks(k)
    if mask is None:
        divisor = jnp.asarray(float(l), q.dtype)
        lm_valid = None
    else:
        counts = mask.reshape(b, m, l).sum(axis=-1)  # [B, m]
        divisor = (counts[:, None, :, None] + eps).astype(q.dtype)
        lm_valid = counts > 0  # [B, m]
    q_l = q_l / divisor
    k_l = k_l / divisor

    sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)     # [B,H,Np,m]
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)   # [B,H,m,m]
    sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)     # [B,H,m,Np]

    if mask is not None:
        pm = mask[:, None, :, None]
        lm = lm_valid[:, None, :, None]
        sim1 = jnp.where(pm & lm.transpose(0, 1, 3, 2), sim1, NEG)
        sim2 = jnp.where(lm & lm.transpose(0, 1, 3, 2), sim2, NEG)
        sim3 = jnp.where(lm & pm.transpose(0, 1, 3, 2), sim3, NEG)

    attn1 = nn.softmax(sim1, axis=-1)
    attn2 = nn.softmax(sim2, axis=-1)
    attn3 = nn.softmax(sim3, axis=-1)
    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations,
                                   global_init=pinv_global_init)

    return (attn1 @ attn2_inv) @ (attn3 @ v)


class NystromAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 64
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    eps: float = 1e-8
    dropout: float = 0.0
    # reference-exact z0 for the NS pinv (see moore_penrose_pinv)
    pinv_global_init: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, _ = x.shape
        h, m = self.heads, self.num_landmarks
        inner = h * self.dim_head

        # pad the front so n is a multiple of m.  The reference zero-pads
        # WITHOUT fabricating a mask when none was passed
        # (nystroformer.py:72-78): pad rows then enter the landmark means
        # with divisor l.  Reproduced exactly; a caller-supplied mask is
        # extended with False over the pad.
        remainder = n % m
        pad = (m - remainder) if remainder > 0 else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (pad, 0)))
        n_p = n + pad

        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=XAVIER2,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n_p, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))  # [B, H, Np, D]

        if mask is not None:
            mf = mask[:, None, :, None].astype(x.dtype)
            q, k, v = q * mf, k * mf, v * mf

        q = q * (self.dim_head ** -0.5)

        out = nystrom_core_jnp(q, k, v, mask, m, self.pinv_iterations,
                               self.eps, self.pinv_global_init)

        if self.residual:
            # depthwise conv over time per head (nystroformer.py:65,137-138)
            # as K shifted multiply-adds: 15x faster than XLA's grouped-conv
            # lowering at these shapes on TPU v5e (1.14 -> 0.076 ms at
            # B=8,N=512) and exact f32 on the VPU (the conv path accumulates
            # in reduced precision). Param shape kept conv-compatible.
            ksize = self.residual_conv_kernel
            kernel = self.param("res_conv", XAVIER2, (h, 1, ksize, 1))
            w = kernel[:, 0, :, 0]                       # [H, K]
            vp = jnp.pad(v, ((0, 0), (0, 0),
                             (ksize // 2, ksize // 2), (0, 0)))
            res = sum(
                w[None, :, j, None, None]
                * jax.lax.dynamic_slice_in_dim(vp, j, n_p, axis=2)
                for j in range(ksize))
            out = out + res

        out = out.transpose(0, 2, 1, 3).reshape(b, n_p, inner)
        out = nn.Dense(self.dim, kernel_init=XAVIER2, bias_init=BIAS01,
                       name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out[:, -n:]
