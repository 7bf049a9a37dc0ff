"""Fused ROI head (projection hoisted before the linear pooling) vs the
literal pool-then-project oracle.

The stride-1 ROI average pooling is linear (zero padded, divisor=scale),
so ``pool(x) @ W + b == pool(x @ W) + b`` exactly; the fused path
(models/dsnet.py:_AnchorHeads.fused_roi) must match the reference
formulation to fp-rounding tolerance on identical params — which also
pins that the two paths share one param pytree (checkpoint compat).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.models.dsnet import (DSNet, DSNetDeepAttention,
                                     DSNetMotionFeatures, DSNetMultiAttention)

B, N, F = 2, 48, 32
SCALES = (4, 8, 11)


def _seq(seed=0, n=N, f=F):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, n, f), jnp.float32)


def _mask():
    return jnp.asarray(np.arange(N)[None, :] < np.asarray([N, 30])[:, None])


def _pair(cls, **kw):
    """Same config twice: fused on / off."""
    return cls(fused_roi_head=True, **kw), cls(fused_roi_head=False, **kw)


def _assert_match(fused_model, oracle_model, *args):
    params = oracle_model.init(jax.random.PRNGKey(0), *args)
    out_o = oracle_model.apply(params, *args)
    out_f = fused_model.apply(params, *args)   # identical pytree required
    for a, b in zip(out_f, out_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # and the param pytree created by the fused path loads into the oracle
    params_f = fused_model.init(jax.random.PRNGKey(1), *args)
    assert (jax.tree.structure(params_f) == jax.tree.structure(params))


@pytest.mark.parametrize("pooling", ["roi", "flat-pooling", "fft", "dwt"])
def test_dsnet_fused_matches_oracle(pooling):
    """roi/flat via fused_roi; fft/dwt via fused_linear_coarse (cls
    projection commuted past the linear coarse pooling, round 5)."""
    scales = SCALES if pooling == "roi" else SCALES[:1]
    kw = dict(base_model="linear", num_feature=F, num_hidden=16,
              anchor_scales=scales, num_head=2, fc_depth=2,
              pooling_type=pooling)
    fused, oracle = _pair(DSNet, **kw)
    _assert_match(fused, oracle, _seq(), _mask())


def test_deep_attention_fused_matches_oracle():
    kw = dict(base_model="attention", num_feature=F, num_hidden=16,
              anchor_scales=SCALES, num_head=2, fc_depth=2,
              attention_depth=3)
    fused, oracle = _pair(DSNetDeepAttention, **kw)
    _assert_match(fused, oracle, _seq(1), _mask())


def test_multi_attention_fused_matches_oracle():
    kw = dict(base_model="attention", num_feature=F, num_hidden=16,
              anchor_scales=SCALES, num_head=2, fc_depth=2)
    fused, oracle = _pair(DSNetMultiAttention, **kw)
    _assert_match(fused, oracle, _seq(2), _mask())


def test_motion_fused_matches_oracle():
    kw = dict(base_model="attention", num_feature=1024, num_hidden=16,
              anchor_scales=SCALES, num_head=2, attention_depth=1)
    fused, oracle = _pair(DSNetMotionFeatures, **kw)
    rng = np.random.RandomState(3)
    seq = jnp.asarray(rng.randn(B, 24, 1024), jnp.float32)
    motion = jnp.asarray(rng.randn(B, 10, 1024), jnp.float32)
    mask = jnp.ones((B, 24), bool)
    mmask = jnp.ones((B, 10), bool)
    _assert_match(fused, oracle, seq, motion, mask, mmask)


def test_predict_decode_unchanged():
    """predict() (device-side anchor decode) rides the fused path too."""
    kw = dict(base_model="linear", num_feature=F, num_hidden=16,
              anchor_scales=SCALES, num_head=2, fc_depth=2,
              pooling_type="roi")
    fused, oracle = _pair(DSNet, **kw)
    x, m = _seq(4), _mask()
    params = oracle.init(jax.random.PRNGKey(0), x, m)
    cls_o, box_o = oracle.apply(params, x, m, method=oracle.predict)
    cls_f, box_f = fused.apply(params, x, m, method=fused.predict)
    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(box_f), np.asarray(box_o),
                               rtol=1e-4, atol=1e-4)
