"""GCN backbone over a top-similarity frame graph, as dense masked matmuls.

Reference: `src/modules/models.py:77-105` builds an edge list from the top
30% of the x @ x.T similarity entries and runs torch-geometric GCNConv.  On
TPU the idiomatic equivalent is a dense adjacency with the standard GCN
normalization  D^-1/2 (A + I) D^-1/2 (GCNConv defaults: add_self_loops with
weight 1, degree = sum of incident edge weights + self loop), computed with
masked matmuls — no sparse gather/scatter needed at these sequence lengths.

(The reference's integer edge decode uses float division at models.py:103 —
a latent break; we implement the intended row = idx // N, col = idx % N
semantics, i.e. plain top-k selection of the dense similarity matrix.)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import BIAS01, XAVIER2


def _monotonic_bits(x):
    """float32 -> uint32 with the same total order (IEEE-754 trick)."""
    u = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                     jnp.uint32)
    neg = (u >> 31).astype(bool)
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _kth_largest_bits(flat, k):
    """(k-th largest monotonic-bit value per row, monotonic image).

    flat: [B, M] float32 (use -inf for invalid); k: [B] int32 (>= 1).
    Exact in 32 count passes — a radix binary search over the monotonic
    uint32 image, O(32*M) elementwise work and no sort.  The image is
    returned too: threshold comparisons must use the identical transform.
    """
    mono = _monotonic_bits(flat)

    def body(bit, prefix):
        cand = prefix | (jnp.uint32(1) << jnp.uint32(bit))
        cnt = jnp.sum((mono >= cand[:, None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt >= k, cand, prefix)

    prefix = jnp.zeros(flat.shape[0], jnp.uint32)
    kth = jax.lax.fori_loop(
        0, 32, lambda i, p: body(31 - i, p), prefix)
    return kth, mono


class GCNExtractor(nn.Module):
    """(B, N, F) -> (B, N, F) one GCNConv layer over a kNN-style graph."""
    num_feature: int
    keep_ratio: float = 0.3

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, f = x.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)
        valid2d = mask[:, :, None] & mask[:, None, :]
        lengths = jnp.sum(mask, axis=-1)

        sim = jnp.einsum("bnf,bmf->bnm", x, x)
        sim = sim - jnp.eye(n, dtype=x.dtype)[None]
        sim = jnp.where(valid2d, sim, -jnp.inf)

        # keep the top int(keep_ratio * len^2) entries per video.  k is
        # data-dependent under padding, so rank-select rather than topk.
        # A bitwise binary search finds the k-th largest VALUE in 32
        # vectorized count passes (no sort): ~6x faster than the round-1
        # double argsort over N^2 on TPU at B=8, N=512.  Ties at the
        # threshold are broken by flat index ascending — identical to a
        # stable descending argsort's rank < k.
        flat = sim.reshape(b, n * n)
        k = (self.keep_ratio
             * (lengths.astype(jnp.float32) ** 2)).astype(jnp.int32)
        kth, mono = _kth_largest_bits(flat, k)
        above = mono > kth[:, None]
        ties = mono == kth[:, None]
        slots = k - jnp.sum(above, axis=-1)
        tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=-1)
        keep = (above | (ties & (tie_rank <= slots[:, None])))
        keep = keep.reshape(b, n, n)

        adj = jnp.where(keep & valid2d, sim, 0.0)
        adj = jnp.where(jnp.isfinite(adj), adj, 0.0)
        # self loops (weight 1) on valid nodes
        eye = jnp.eye(n, dtype=x.dtype)[None] * mask[:, None, :].astype(x.dtype) \
            * mask[:, :, None].astype(x.dtype)
        adj = adj + eye

        deg = jnp.sum(adj, axis=-1)
        # double-where: sqrt must never see deg <= 0 (possible with signed
        # features whose kept weights sum <= -1) or its untaken-branch
        # NaN/inf derivative poisons the whole step's gradients
        safe_deg = jnp.where(deg > 0, deg, 1.0)
        dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(safe_deg), 0.0)
        norm_adj = adj * dinv[:, :, None] * dinv[:, None, :]

        h = nn.Dense(self.num_feature, use_bias=False, kernel_init=XAVIER2,
                     name="lin")(x)
        out = jnp.einsum("bnm,bmf->bnf", norm_adj, h)
        bias = self.param("bias", BIAS01, (self.num_feature,))
        return out + bias
