"""Ring attention: sequence/context parallelism over the device mesh.

The reference handles long sequences algorithmically (sub-quadratic
mixers, SURVEY.md §5); the idiomatic-TPU complement is sharding the frame
axis itself.  Here Q/K/V are sharded along the sequence axis across the
mesh; each device attends its local queries against the K/V shard it
currently holds while the shards rotate around the ring via
``jax.lax.ppermute`` (ICI neighbor exchanges, no all-gather), with the
online-softmax recurrence merging partial results — the same math as
kernels/flash_attention.py, distributed.

Per device the score block is [n/P, n/P]; peak memory drops P-fold and
the N^2 work is split P ways, so videos far beyond single-chip HBM (raw
multi-hour footage before subsampling) still run the exact vanilla
attention semantics (masked softmax, models/attention.py).

Communication rides the ring: P-1 ppermute rounds of the K/V shard
(2 * N/P * D floats each), fully overlappable with the block compute.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG = -1e30


def _ring_body(q_l, k_l, v_l, m_l, axis_name: str, scale: float):
    """Per-device program: local queries vs rotating K/V shards."""
    axis_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    b, h, nl, d = q_l.shape
    q = q_l * scale
    acc = jnp.zeros((b, h, nl, d), jnp.float32)
    mx = jnp.full((b, h, nl, 1), NEG, jnp.float32)
    den = jnp.zeros((b, h, nl, 1), jnp.float32)

    k_cur, v_cur, m_cur = k_l, v_l, m_l
    for step in range(axis_size):
        s = jnp.einsum("bhid,bhjd->bhij", q, k_cur)
        s = jnp.where(m_cur[:, None, None, :], s, NEG)
        new_mx = jnp.maximum(mx, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(mx - new_mx)
        p = jnp.exp(s - new_mx)
        den = den * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhij,bhjd->bhid", p, v_cur)
        mx = new_mx
        if step + 1 < axis_size:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
    return acc / jnp.maximum(den, 1e-30)


def ring_attention(q, k, v, mask=None, *, mesh, axis_name: str = "data",
                   batch_axis: str | None = None,
                   head_axis: str | None = None):
    """Exact masked attention with the sequence axis sharded over ``mesh``.

    q/k/v: [B, H, N, D]; mask: [B, N] bool or None; N must divide by the
    mesh's ``axis_name`` size.  Returns [B, H, N, D], sharded like the
    inputs.

    ``batch_axis``/``head_axis`` name additional mesh axes for the batch
    and head dimensions, composing the ring with data parallelism and
    Megatron head sharding (parallel/tensor_parallel.py) on one 3-D
    ``('data', 'seq', 'model')`` mesh: the ring's ppermute rotates K/V
    only along ``axis_name``, each (batch-shard, head-shard) runs its own
    independent ring, and no collective crosses the other two axes.  The
    per-device score block shrinks to [B/dp, H/tp, n/sp, n/sp].
    """
    b, h, n, d = q.shape
    p_size = mesh.shape[axis_name]
    assert n % p_size == 0, (n, p_size)
    if batch_axis is not None:
        assert b % mesh.shape[batch_axis] == 0, (b, batch_axis)
    if head_axis is not None:
        assert h % mesh.shape[head_axis] == 0, (h, head_axis)
    if mask is None:
        mask = jnp.ones((b, n), bool)
    scale = d ** -0.5

    qkv_spec = P(batch_axis, head_axis, axis_name, None)
    fn = jax.shard_map(
        partial(_ring_body, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(batch_axis, axis_name)),
        out_specs=qkv_spec,
    )
    return fn(q.astype(jnp.float32), k.astype(jnp.float32),
              v.astype(jnp.float32), mask)
