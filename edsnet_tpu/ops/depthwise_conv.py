"""Depthwise time-axis convolution with a hand-written backward.

The nystromformer residual branch applies a per-head depthwise conv over
time (reference `src/transformer/nystroformer.py:65,137-138`).  Round 2
lowered it as K shifted multiply-adds — fast FORWARD (0.076 ms vs 1.14 ms
for the NCHW grouped conv at B=8, N=512 on v5e), but its autodiff
backward dominated the whole train step: dv is 33 pad-and-accumulate
tensors and dw is 33 full reductions, ~1.1 ms of the 1.8 ms step.

This op keeps the shifted multiply-add in every direction and hand-picks
the adjoint formulations (all measured on v5e, in isolation AND inside
the full train step):

- primal:   K shifted multiply-adds (VPU-fused, f32-exact).  An NHC
            depthwise conv (`feature_group_count = H*D`) measures 0.011
            ms in isolation but layout-conflicts with the surrounding
            transposes inside the real model and REGRESSES the full
            step 2x — isolated micro-benchmarks lie about convs.
- dv:       the same shifted form with the kernel flipped (correlation
            adjoint), exact.
- dw[h,j] = sum_{b,t,d} g[b,h,t,d] * vpad[b,h,t+j,d]: K fused
            multiply-reduce passes over dynamic slices — f32-exact,
            unlike the conv filter-gradient lowering (~4e-4 abs err).

fwd+bwd in isolation: 0.36 ms vs 1.53 ms for autodiff-of-shifted (4.2x);
gradients match the autodiff oracle to fp rounding
(tests/ops/test_depthwise_conv.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depthwise_time_conv_reference(v, w):
    """Shifted multiply-add oracle. v: [B,H,T,D]; w: [H,K], K odd.

    out[b,h,t,d] = sum_j w[h,j] * vpad[b,h,t+j,d] with vpad zero-padded
    by K//2 on both sides of the time axis.
    """
    _, _, t, _ = v.shape
    k = w.shape[1]
    p = k // 2
    vp = jnp.pad(v, ((0, 0), (0, 0), (p, p), (0, 0)))
    return sum(w[None, :, j, None, None]
               * jax.lax.dynamic_slice_in_dim(vp, j, t, axis=2)
               for j in range(k))


@jax.custom_vjp
def depthwise_time_conv(v, w):
    """v: [B,H,T,D], w: [H,K] (K odd) -> [B,H,T,D]."""
    return depthwise_time_conv_reference(v, w)


def _dtc_fwd(v, w):
    return depthwise_time_conv_reference(v, w), (v, w)


def _dtc_bwd(saved, g):
    v, w = saved
    t = v.shape[2]
    k = w.shape[1]
    p = k // 2
    # cotangents must match the primal dtypes exactly (custom_vjp contract)
    # — e.g. bf16 activations with f32 params make g/dv f32 while v is bf16
    dv = depthwise_time_conv_reference(g, w[:, ::-1])
    vp = jnp.pad(v, ((0, 0), (0, 0), (p, p), (0, 0)))
    dw = jnp.stack([
        jnp.sum(g * jax.lax.dynamic_slice_in_dim(vp, j, t, axis=2),
                axis=(0, 2, 3))
        for j in range(k)], axis=1)
    return dv.astype(v.dtype), dw.astype(w.dtype)


depthwise_time_conv.defvjp(_dtc_fwd, _dtc_bwd)
