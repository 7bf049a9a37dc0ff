"""The prefix-sum landmark grouping must equal the one-hot assignment
contraction it replaced (round-4 batch-scaling rework).

The assignment-matrix formulation (round 2/3) is kept here as the spec
oracle: A[b, g, t] = [(t + pad_b) // l_v_b == g] & mask, landmark =
(A @ q) / l_v — the exact per-video front-pad grouping of the reference
(nystroformer.py:72-111).  The shipped path computes the same sums as
prefix-sum differences at the m+1 contiguous group boundaries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.models.nystromformer import nystrom_core_jnp


def _onehot_core(q, k, v, mask, m, iters, eps=1e-8):
    """Round-3 formulation, verbatim (the spec oracle)."""
    from flax import linen as nn

    from edsnet_tpu.models.nystromformer import NEG, moore_penrose_pinv
    b, h, L, d = q.shape
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
    l_v = jnp.maximum(-(-lengths // m), 1)
    pad_v = l_v * m - lengths
    t_ax = jnp.arange(L)
    g_of_t = (t_ax[None, :] + pad_v[:, None]) // l_v[:, None]
    assign = (g_of_t[:, None, :] == jnp.arange(m)[None, :, None]) \
        & mask[:, None, :]
    assign = assign.astype(q.dtype)
    inv_l = (1.0 / l_v.astype(q.dtype))[:, None, None, None]
    q_l = jnp.einsum("bmt,bhtd->bhmd", assign, q) * inv_l
    k_l = jnp.einsum("bmt,bhtd->bhmd", assign, k) * inv_l
    sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
    sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)
    attn1 = nn.softmax(sim1, axis=-1)
    attn2 = nn.softmax(sim2, axis=-1)
    pm = mask[:, None, None, :]
    s3 = jnp.where(pm, sim3, NEG)
    max_real = jnp.max(s3, axis=-1, keepdims=True)
    phantom = (pad_v > 0)[:, None, None, None]
    m3 = jnp.maximum(max_real, jnp.where(phantom, 0.0, NEG))
    num = jnp.where(pm, jnp.exp(s3 - m3), 0.0)
    denom = jnp.sum(num, axis=-1, keepdims=True) \
        + pad_v.astype(q.dtype)[:, None, None, None] * jnp.exp(-m3)
    attn3 = num / jnp.maximum(denom, eps)
    attn2_inv = moore_penrose_pinv(attn2, iters)
    return (attn1 @ attn2_inv) @ (attn3 @ v)


@pytest.mark.parametrize("lengths", [(37,), (64, 19, 64, 3), (128, 100)])
def test_prefix_sum_matches_onehot_assignment(lengths):
    b, h, d, m = len(lengths), 2, 8, 8
    L = max(lengths)
    rng = np.random.RandomState(0)
    mask = np.zeros((b, L), bool)
    for i, n in enumerate(lengths):
        mask[i, :n] = True
    mf = mask[:, None, :, None]

    def masked(x):
        return jnp.asarray(np.where(mf, x, 0.0).astype(np.float32))

    q = masked(rng.randn(b, h, L, d))
    k = masked(rng.randn(b, h, L, d))
    v = masked(rng.randn(b, h, L, d))
    mask = jnp.asarray(mask)

    got = nystrom_core_jnp(q, k, v, mask, m, 6)
    want = _onehot_core(q, k, v, mask, m, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_prefix_sum_gradients_match_onehot():
    b, h, L, d, m = 2, 2, 32, 4, 8
    rng = np.random.RandomState(1)
    mask_np = np.zeros((b, L), bool)
    mask_np[0, :L] = True
    mask_np[1, :21] = True
    mf = mask_np[:, None, :, None]
    q = jnp.asarray(np.where(mf, rng.randn(b, h, L, d), 0.0)
                    .astype(np.float32))
    k = jnp.asarray(np.where(mf, rng.randn(b, h, L, d), 0.0)
                    .astype(np.float32))
    v = jnp.asarray(np.where(mf, rng.randn(b, h, L, d), 0.0)
                    .astype(np.float32))
    mask = jnp.asarray(mask_np)
    w = jnp.asarray(np.where(mf, rng.randn(b, h, L, d), 0.0)
                    .astype(np.float32))

    def loss_new(q, k, v):
        return jnp.sum(nystrom_core_jnp(q, k, v, mask, m, 6) * w)

    def loss_old(q, k, v):
        return jnp.sum(_onehot_core(q, k, v, mask, m, 6) * w)

    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    g_old = jax.grad(loss_old, argnums=(0, 1, 2))(q, k, v)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(go),
                                   atol=1e-4, rtol=1e-3)
