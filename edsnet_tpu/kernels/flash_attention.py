"""Masked flash attention (blockwise online-softmax) for TPU.

Why: the vanilla attention backbone materializes the [B, H, N, N] score
matrix in HBM — at B=2, N=4096 that is ~1 GB of traffic and XLA takes
4.9 ms (benchmarks/RESULTS.md).  This kernel streams K/V blocks through
VMEM with the online-softmax recurrence, so HBM traffic is O(N*D) and the
MXU stays busy: the score matrix never leaves the chip.

Semantics match `models/attention.py` exactly: scores q @ k^T / sqrt(D),
key positions where mask is False are excluded from the softmax
(masked_softmax uses finfo.min — here -1e30), no dropout (the kernel
serves the deterministic eval/predict path; training at EDSNet's N≈512
keeps the XLA path, whose score matrix is tiny).

Backward (round 3): full Pallas kernels with the standard recomputation
scheme — the forward additionally emits the per-row softmax statistics,
and the backward recomputes P blockwise to accumulate dq (k-minor grid)
and dk/dv (q-minor grid).  HBM traffic stays O(N*D) end to end, so
long-N *training* gets the memory benefit too; the plain-XLA twin remains
as the numerical oracle in tests.

The row statistics are stored as the (max m, denominator l) PAIR rather
than the collapsed logsumexp m + log(l): for a fully-masked row m is
-1e30 and adding log(N) is lost to f32 rounding (ulp(1e30) ~ 1e23), which
would make the backward weight every key with p = exp(0) = 1 instead of
the oracle softmax's uniform 1/N.  p = exp(s - m) / l is algebraically
identical elsewhere and exact in that edge case.

Pad keys (time-axis padding to a block multiple) are distinguished from
real-but-masked keys by mask value -1 vs 0 and scored 2*NEG vs NEG: in a
fully-masked row (m = NEG) real masked keys then get exp(0) = 1 — the
oracle's uniform fallback over the REAL length n — while pad keys get
exp(NEG) = 0 and stay out of the denominator.  With a single mask level
the uniform fallback would run over n_pad and skew out/dv by n/n_pad.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    # compiled on TPU; interpreter elsewhere (CPU test runs)
    return jax.default_backend() != "tpu"


def _precision(name: str):
    return {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[name]


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, mrow_ref, lrow_ref,
                  acc_ref, m_ref, l_ref, *, scale: float, prec: str):
    """One (batch*head, q-block, k-block) grid step.

    The k axis is the minor grid dimension: TPU grid steps run
    sequentially per core, so the online-softmax state (acc/m/l scratch)
    carries across k blocks of the same q block — K/V stream through VMEM
    one block at a time and the [BQ, N] score matrix never exists.
    """
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0] * scale                                   # [BQ, D]
    k_blk = k_ref[0]                                       # [BK, D]
    v_blk = v_ref[0]
    km = mask_ref[0, 0]                                    # [BK]

    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))                # [BQ, BK]
    # km: 1 attend, 0 real-but-masked (NEG), -1 time-axis pad (2*NEG —
    # excluded even from a fully-masked row's uniform fallback)
    s = jnp.where(km[None, :] > 0, s,
                  jnp.where(km[None, :] == 0, NEG, 2 * NEG))

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                                 # [BQ, BK]
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1,
                                                  keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))
    m_ref[:, :1] = m_new

    @pl.when(kk == nk - 1)
    def _():
        l_fin = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = acc_ref[:] / l_fin
        mrow_ref[0] = m_ref[:, :1]                         # [BQ, 1]
        lrow_ref[0] = l_fin


def _flash_forward(q, k, v, mask, block_q: int, block_k: int,
                   prec: str = "default"):
    """Returns (out [BH, N, D], mrow, lrow [BH, N, 1] — column layout so
    their (1, BQ, 1) blocks satisfy the TPU tiling rules and land in
    kernels as the [BQ, 1] columns the softmax math needs,
    transpose-free)."""
    bh, n, d = q.shape
    scale = d ** -0.5
    grid = (bh, pl.cdiv(n, block_q), pl.cdiv(n, block_k))
    return pl.pallas_call(
        partial(_flash_kernel, scale=scale, prec=prec),
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n, 1), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # acc
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n * d, transcendentals=n * n,
            bytes_accessed=4 * (3 * n * d + n)),
        interpret=_interpret(),
    )(q, k, v, mask)


def _dq_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, mrow_ref, lrow_ref,
               dd_ref, dq_ref, acc_ref, *, scale: float, prec: str):
    """dq accumulation: grid (bh, q-block, k-block), k minor.

    ds = P * (dP - D) with P = exp(S - m) / l, dP = g V^T,
    D = rowsum(g * o); dq_i = scale * sum_j ds_ij K_j.
    """
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * scale                                   # [BQ, D]
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    km = mask_ref[0, 0]
    g = g_ref[0]                                           # [BQ, D]
    mrow = mrow_ref[0]                                     # [BQ, 1]
    lrow = lrow_ref[0]                                     # [BQ, 1]
    dd = dd_ref[0]                                         # [BQ, 1]

    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))
    s = jnp.where(km[None, :] > 0, s,
                  jnp.where(km[None, :] == 0, NEG, 2 * NEG))
    p = jnp.exp(s - mrow) / lrow                           # [BQ, BK]
    dp = jax.lax.dot_general(
        g, v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))                # [BQ, BK]
    # the oracle's where(mask, s, NEG) blocks dS through masked keys
    # (p itself stays live for dv: a fully-masked row has p = 1/N)
    ds = jnp.where(km[None, :] > 0, p * (dp - dd), 0.0)
    acc_ref[:] += jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))

    @pl.when(kk == nk - 1)
    def _():
        dq_ref[0] = acc_ref[:] * scale


def _dkv_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, mrow_ref, lrow_ref,
                dd_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                prec: str):
    """dk/dv accumulation: grid (bh, k-block, q-block), q minor."""
    qq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0] * scale
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    km = mask_ref[0, 0]
    g = g_ref[0]
    mrow = mrow_ref[0]                                     # [BQ, 1]
    lrow = lrow_ref[0]                                     # [BQ, 1]
    dd = dd_ref[0]                                         # [BQ, 1]

    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))                # [BQ, BK]
    s = jnp.where(km[None, :] > 0, s,
                  jnp.where(km[None, :] == 0, NEG, 2 * NEG))
    p = jnp.exp(s - mrow) / lrow
    # dv_j += P^T g
    dv_acc[:] += jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))                # [BK, D]
    dp = jax.lax.dot_general(
        g, v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))
    # masked keys get no dS (oracle where-backward); see _dq_kernel
    ds = jnp.where(km[None, :] > 0, p * (dp - dd), 0.0)    # [BQ, BK]
    # dk_j += scale * dS^T q_raw; q here is pre-scaled, so scale folds in
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(prec))                # [BK, D]

    @pl.when(qq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:]
        dv_ref[0] = dv_acc[:]


def _flash_backward(q, k, v, mask, o, mrow, lrow, g,
                    block_q: int, block_k: int, prec: str = "default"):
    bh, n, d = q.shape
    scale = d ** -0.5
    g = g.astype(jnp.float32)
    dd = jnp.sum(g * o, axis=-1, keepdims=True)            # [BH, N, 1]

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        partial(_dq_kernel, scale=scale, prec=prec),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        grid=(bh, pl.cdiv(n, block_q), pl.cdiv(n, block_k)),
        in_specs=[q_spec, k_spec, k_spec, mask_spec, q_spec, row_spec,
                  row_spec, row_spec],
        out_specs=q_spec,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * n * d, transcendentals=n * n,
            bytes_accessed=4 * (5 * n * d + 3 * n)),
        interpret=_interpret(),
    )(q, k, v, mask, g, mrow, lrow, dd)

    # q-minor grid: index maps swap (i, j) meaning — dim 1 is the K block
    kq_q_spec = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    kq_k_spec = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                             memory_space=pltpu.VMEM)
    kq_mask_spec = pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b, 0, j),
                                memory_space=pltpu.VMEM)
    kq_row_spec = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        partial(_dkv_kernel, scale=scale, prec=prec),
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n, d), jnp.float32)],
        grid=(bh, pl.cdiv(n, block_k), pl.cdiv(n, block_q)),
        in_specs=[kq_q_spec, kq_k_spec, kq_k_spec, kq_mask_spec, kq_q_spec,
                  kq_row_spec, kq_row_spec, kq_row_spec],
        out_specs=[kq_k_spec, kq_k_spec],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * n * d, transcendentals=n * n,
            bytes_accessed=4 * (7 * n * d + 3 * n)),
        interpret=_interpret(),
    )(q, k, v, mask, g, mrow, lrow, dd)
    return dq, dk, dv


def _attention_xla(q, k, v, mask):
    """Plain-XLA twin (numerical oracle in tests)."""
    d = q.shape[-1]
    s = jnp.einsum("bnd,bmd->bnm", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    s = jnp.where(mask[:, None, :] > 0, s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, block_q, block_k, prec):
    out, _, _ = _flash_forward(q, k, v, mask, block_q, block_k, prec)
    return out


def _flash_fwd(q, k, v, mask, block_q, block_k, prec):
    out, mrow, lrow = _flash_forward(q, k, v, mask, block_q, block_k, prec)
    return out, (q, k, v, mask, out, mrow, lrow)


def _flash_bwd(block_q, block_k, prec, res, g):
    q, k, v, mask, o, mrow, lrow = res
    dq, dk, dv = _flash_backward(q, k, v, mask, o, mrow, lrow, g,
                                 block_q, block_k, prec)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, mask=None, block_q: int = 512,
                    block_k: int = 512, precision: str = "default"):
    """Masked multi-head attention, O(N*D) HBM traffic (fwd AND bwd).

    q/k/v: [B, H, N, D] float32; mask: [B, N] bool or None.
    Returns [B, H, N, D].

    ``precision``: MXU multiply precision for every dot in the kernels
    (accumulation is always f32 scratch).  "default" = native bf16-ish
    multiplies (matches the XLA path's default); "highest" = f32-exact
    multiplies via multi-pass bf16 — use when a <=1e-3 bound vs an f32
    oracle matters (e.g. long-N training gradients).
    """
    b, h, n, d = q.shape
    if mask is None:
        m32 = jnp.ones((b, n), jnp.int32)
    else:
        m32 = mask.astype(jnp.int32)

    # pad the time axis so a block size divides it (length buckets are
    # multiples of 64 already; exact-length calls get padded + cropped,
    # with the pad masked out of the softmax)
    def fit(block):
        while n_pad % block:
            block //= 2
        return max(block, 64)

    n_pad = -(-n // 64) * 64
    block_q = fit(min(block_q, n_pad))
    block_k = fit(min(block_k, n_pad))
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        # pad keys are -1 (vs 0 = real-but-masked): a fully-masked row's
        # uniform softmax fallback must run over the REAL length only
        m32 = jnp.pad(m32, ((0, 0), (0, n_pad - n)), constant_values=-1)

    m32 = jnp.broadcast_to(m32[:, None, :],
                           (b, h, n_pad)).reshape(b * h, 1, n_pad)

    def flat(t):
        return t.reshape(b * h, n_pad, d).astype(jnp.float32)

    out = _flash(flat(q), flat(k), flat(v), m32, block_q, block_k,
                 precision)
    return out.reshape(b, h, n_pad, d)[:, :, :n]
