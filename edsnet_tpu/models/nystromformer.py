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
actually favors a hand-written kernel.  Padded buckets reproduce the
reference's *exact-length* computation per video (round 2): the per-video
front-pad landmark grouping is emulated with assignment matrices — see
``nystrom_core_jnp`` — so the padded==unpadded invariant holds for this
backbone too.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import XAVIER2, BIAS01
from edsnet_tpu.ops.depthwise_conv import depthwise_time_conv

NEG = -1e30


def moore_penrose_pinv(x, iters: int = 6):
    """Newton–Schulz iterative pseudo-inverse. (nystroformer.py:13-28)

    z0 scaling uses the per-video max of the column/row sums across heads
    and landmarks — exactly the reference's einops reduction at
    nystroformer.py:19 (its '...' spans the head axis; batch is 1 there,
    so per-video == its global max).  x: [B, H, m, m].
    """
    abs_x = jnp.abs(x)
    col = jnp.max(jnp.sum(abs_x, axis=-1), axis=(-2, -1), keepdims=True)
    row = jnp.max(jnp.sum(abs_x, axis=-2), axis=(-2, -1), keepdims=True)
    z = jnp.swapaxes(x, -1, -2) / (col * row)[..., None]

    eye = jnp.eye(x.shape[-1], dtype=x.dtype)

    # unrolled on purpose: scan's backward saves/restores the [B,H,m,m]
    # carry per iteration and serializes into 6 tiny sequential kernels —
    # unrolling lets XLA fuse across iterations (module backward pass
    # 2.12 -> 1.6 ms at B=8, N=512 on v5e)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))
    return z


def nystrom_core_jnp(q, k, v, mask, num_landmarks: int,
                     pinv_iterations: int, eps: float = 1e-8):
    """Landmark attention core. q/k/v: [B, H, L, D] (masked, q scaled);
    mask: [B, L] or None. Returns [B, H, L, D].

    Length semantics are EXACT per video: the reference front-pads each
    (batch-1, unmasked) video to n_p = ceil(n/m)*m and groups consecutive
    l_v = n_p/m positions per landmark (nystroformer.py:72-111).  Inside a
    padded bucket the true length n varies per video, so the same grouping
    is reproduced with a per-video landmark-assignment matrix
    A[b, g, t] = [ (t + pad_b) // l_v_b == g ] — one [B, m, L] one-hot
    contraction per Q/K, MXU-cheap — and the reference's *unmasked*
    softmax semantics: landmark groups that fall entirely in the front pad
    are zero vectors that legitimately enter the softmaxes (exp(0) terms),
    and attn3's denominator counts the pad_b phantom zero-logit positions.
    Every real position therefore matches the reference's exact-length
    computation; bucket-pad rows are garbage and masked downstream.
    """
    b, h, L, d = q.shape
    m = num_landmarks

    if mask is None:
        l = L // m

        def landmarks(t):
            return t.reshape(b, h, m, l, d).sum(axis=3) / float(l)

        q_l, k_l = landmarks(q), landmarks(k)
        sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
        sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)
        attn1 = nn.softmax(sim1, axis=-1)
        attn2 = nn.softmax(sim2, axis=-1)
        attn3 = nn.softmax(sim3, axis=-1)
    else:
        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)        # [B]
        l_v = jnp.maximum(-(-lengths // m), 1)                    # [B]
        pad_v = l_v * m - lengths                                 # [B]
        # Landmark groups are CONTIGUOUS time ranges per video (group g
        # covers t in [g*l_v - pad, (g+1)*l_v - pad)), so the group sums
        # are differences of a prefix sum at m+1 boundary positions — an
        # O(B*H*L*D) cumsum + an m-row gather per video — instead of the
        # round-3 [B,m,L] one-hot einsum, whose fwd+bwd one-hot
        # contractions dominated the step's superlinear batch scaling
        # (2.04 -> 26.8 ms for B 8 -> 64 at N=512).  Front-pad-only
        # groups clip to an empty [0,0) range = zero vector, matching the
        # reference's zero front-pad rows (nystroformer.py:72-78);
        # rows past the true length are already masked to zero in q/k.
        g_ax = jnp.arange(m + 1, dtype=jnp.int32)
        bounds = jnp.clip(g_ax[None, :] * l_v[:, None] - pad_v[:, None],
                          0, L)                                   # [B, m+1]
        inv_l = (1.0 / l_v.astype(jnp.float32))[:, None, None, None]

        def group_means(t):                                       # [B,H,L,D]
            # accumulate in f32: a bf16 cumsum (under --compute-dtype
            # bfloat16) would carry ~2^-8*sqrt(L) relative error into the
            # landmark means; the one-hot einsum it replaced accumulated
            # on the MXU in f32
            cs = jnp.cumsum(t.astype(jnp.float32), axis=2)
            cs = jnp.pad(cs, ((0, 0), (0, 0), (1, 0), (0, 0)))    # [B,H,L+1,D]
            picked = jnp.take_along_axis(
                cs, bounds[:, None, :, None], axis=2)             # [B,H,m+1,D]
            means = (picked[:, :, 1:] - picked[:, :, :-1]) * inv_l
            return means.astype(t.dtype)

        q_l, k_l = group_means(q), group_means(k)

        sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)     # [B,H,L,m]
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)   # [B,H,m,m]
        sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)     # [B,H,m,L]

        attn1 = nn.softmax(sim1, axis=-1)
        attn2 = nn.softmax(sim2, axis=-1)
        # attn3: softmax over the reference's n_p = n + pad_v positions —
        # n real logits plus pad_v phantom zeros (front-pad rows have
        # k = 0 => logit 0 in the reference); bucket-pad entries beyond n
        # are excluded but their phantom count is added to the denominator
        pm = mask[:, None, None, :]
        s3 = jnp.where(pm, sim3, NEG)
        max_real = jnp.max(s3, axis=-1, keepdims=True)
        phantom = (pad_v > 0)[:, None, None, None]
        m3 = jnp.maximum(max_real, jnp.where(phantom, 0.0, NEG))
        num = jnp.where(pm, jnp.exp(s3 - m3), 0.0)
        denom = jnp.sum(num, axis=-1, keepdims=True) \
            + pad_v.astype(q.dtype)[:, None, None, None] * jnp.exp(-m3)
        attn3 = num / jnp.maximum(denom, eps)

    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)
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

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, _ = x.shape
        h, m = self.heads, self.num_landmarks
        inner = h * self.dim_head

        # Unmasked input: front-pad with zeros so n is a multiple of m,
        # exactly like the reference (nystroformer.py:72-78; no mask is
        # fabricated — pad rows enter the landmark means with divisor l).
        # Masked input: no padding here — nystrom_core_jnp emulates the
        # reference's per-video front-pad grouping analytically, so any
        # bucket length works and every real position is exact.
        remainder = n % m
        pad = (m - remainder) if (remainder > 0 and mask is None) else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
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
                               self.eps)

        if self.residual:
            # depthwise conv over time per head (nystroformer.py:65,137-138).
            # Round-2 used K shifted multiply-adds (15x over the NCHW
            # grouped-conv lowering) but its autodiff backward dominated the
            # train step (~1.1 of 1.8 ms); ops/depthwise_conv.py keeps the
            # fast forward (NHC depthwise conv, 0.011 ms) and hand-writes
            # the exact backward (fwd+bwd 1.53 -> 0.36 ms on v5e).
            # Param shape kept conv-compatible.
            ksize = self.residual_conv_kernel
            kernel = self.param("res_conv", XAVIER2, (h, 1, ksize, 1))
            out = out + depthwise_time_conv(v, kernel[:, 0, :, 0])

        out = out.transpose(0, 2, 1, 3).reshape(b, n_p, inner)
        out = nn.Dense(self.dim, kernel_init=XAVIER2, bias_init=BIAS01,
                       name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out[:, -n:]
