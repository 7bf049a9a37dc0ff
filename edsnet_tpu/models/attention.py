"""Vanilla multi-head self-attention backbone.

Reference: `src/modules/models.py:12-74` (ScaledDotProductAttention with
dropout 0.5 *on the attention map*, MultiHeadAttention with bias-free
projections and a bias-free output fc + dropout 0.5).  Unlike the reference
(which hard-codes batch 1 at models.py:52-57), this is batched and
mask-aware: padded key positions are excluded from the softmax, so a padded
bucket reproduces the unpadded computation exactly.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from edsnet_tpu.models.common import XAVIER2, masked_softmax


class AttentionExtractor(nn.Module):
    """(B, N, F) -> (B, N, F) self-attention mixing.

    ``use_pallas`` routes the deterministic path at long N through the
    flash-attention kernel (kernels/flash_attention.py): O(N*D) HBM
    traffic instead of the materialized [B,H,N,N] score matrix.  Training
    keeps the XLA path — the reference applies dropout ON the attention
    map (models.py:15,23), which requires materializing it anyway.
    """
    num_head: int = 8
    num_feature: int = 1024
    attn_dropout: float = 0.5
    out_dropout: float = 0.5
    use_pallas: bool = False
    pallas_min_len: int = 1024
    # MXU multiply precision inside the flash kernels ("default" |
    # "highest"); the shipped auto-default uses "highest" so the
    # documented <=1e-3 bound vs the f32 oracle holds for what users run
    pallas_precision: str = "default"
    # >0: shard the sequence axis over that many devices via ring
    # attention (parallel/ring_attention.py) when N >= cp_min_len and N
    # divides the mesh; -1 = all local devices (--context-parallel)
    context_parallel: int = 0
    cp_min_len: int = 1024

    def _ring_plan(self, b: int, h: int, n: int, deterministic: bool):
        """(mesh, seq_axis, batch_axis, head_axis) for the ring, or None
        for the dense/flash path.

        When the trainer/evaluate CLI registered a global mesh
        (models.base.set_ring_mesh) the ring rides its sequence axis —
        inside one jit every mesh must span the same device set, so a
        private sub-mesh would clash with params/batches committed to the
        global one.  The batch/head axes join only when the dims divide
        them (they fall back to replicated, never to a crash).

        Standalone (no registration): a private ``('data',)`` mesh over
        the first P devices, clamped to the devices actually present
        before the divisibility check — checking against the REQUESTED
        count could assert-fail inside ring_attention (or silently
        under-shard) on smaller hosts.
        """
        if not self.context_parallel or not deterministic:
            return None
        if n < self.cp_min_len:
            return None
        from edsnet_tpu.models.base import RING_DISABLED, get_ring_mesh
        reg = get_ring_mesh()
        if reg is RING_DISABLED:
            return None
        if reg is not None:
            mesh, seq_ax, b_ax, h_ax = reg
            p = mesh.shape[seq_ax]
            if p < 2 or n % p:
                return None
            if b_ax is not None and b % mesh.shape[b_ax]:
                b_ax = None
            if h_ax is not None and h % mesh.shape[h_ax]:
                h_ax = None
            return mesh, seq_ax, b_ax, h_ax
        import jax
        avail = len(jax.devices())
        p = self.context_parallel if self.context_parallel > 0 else avail
        p = min(p, avail)
        if p < 2 or n % p:
            return None
        from edsnet_tpu.parallel import make_mesh
        return make_mesh(p), "data", None, None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, f = x.shape
        h = self.num_head
        if f % h:
            raise ValueError(f"num_feature {f} must be divisible by "
                             f"num_head {h} (head split)")
        d_k = f // h

        def proj(name):
            return nn.Dense(f, use_bias=False, kernel_init=XAVIER2,
                            name=name)(x)

        q = proj("Q").reshape(b, n, h, d_k).transpose(0, 2, 1, 3)
        k = proj("K").reshape(b, n, h, d_k).transpose(0, 2, 1, 3)
        v = proj("V").reshape(b, n, h, d_k).transpose(0, 2, 1, 3)

        plan = self._ring_plan(b, h, n, deterministic)
        if plan is not None:
            from edsnet_tpu.parallel.ring_attention import ring_attention
            mesh, seq_ax, b_ax, h_ax = plan
            # ring_attention applies the d_k**-0.5 scale itself
            y = ring_attention(q, k, v, mask, mesh=mesh, axis_name=seq_ax,
                               batch_axis=b_ax,
                               head_axis=h_ax).astype(x.dtype)
        elif self.use_pallas and deterministic and n >= self.pallas_min_len:
            from edsnet_tpu.kernels.flash_attention import flash_attention
            y = flash_attention(q, k, v, mask,
                                precision=self.pallas_precision)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(d_k)
            key_mask = None if mask is None else mask[:, None, None, :]
            attn = masked_softmax(attn, key_mask, axis=-1)
            attn = nn.Dropout(self.attn_dropout)(
                attn, deterministic=deterministic)
            y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, f)
        y = nn.Dense(f, use_bias=False, kernel_init=XAVIER2, name="fc")(y)
        y = nn.Dropout(self.out_dropout)(y, deterministic=deterministic)
        return y
