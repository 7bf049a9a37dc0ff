"""depthwise_time_conv custom-VJP vs the shifted multiply-add oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.ops.depthwise_conv import (depthwise_time_conv,
                                           depthwise_time_conv_reference)


def _inputs(b=2, h=3, t=40, d=8, k=9, seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    w = jnp.asarray(rng.randn(h, k) * 0.2, jnp.float32)
    return v, w


@pytest.mark.parametrize("k", [1, 5, 33])
def test_forward_matches_oracle(k):
    v, w = _inputs(k=k, seed=k)
    np.testing.assert_allclose(
        np.asarray(depthwise_time_conv(v, w)),
        np.asarray(depthwise_time_conv_reference(v, w)),
        rtol=1e-5, atol=1e-5)


def test_gradients_match_autodiff_oracle():
    v, w = _inputs(k=9, seed=1)

    def loss(fn, v, w):
        return jnp.sum(jnp.sin(fn(v, w)))

    gv, gw = jax.grad(lambda v, w: loss(depthwise_time_conv, v, w),
                      argnums=(0, 1))(v, w)
    ov, ow = jax.grad(
        lambda v, w: loss(depthwise_time_conv_reference, v, w),
        argnums=(0, 1))(v, w)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ow),
                               rtol=1e-5, atol=1e-5)


def test_mixed_precision_cotangent_dtypes():
    """bf16 activations with f32 kernel (the bf16-default training
    config): the custom VJP must return cotangents matching the PRIMAL
    dtypes.  Regression: dv came back f32 for a bf16 v, which JAX rejects
    at the first grad trace."""
    v, w = _inputs(k=5, seed=3)
    v = v.astype(jnp.bfloat16)

    def loss(v, w):
        return jnp.sum(depthwise_time_conv(v, w).astype(jnp.float32) ** 2)

    gv, gw = jax.grad(loss, argnums=(0, 1))(v, w)
    assert gv.dtype == jnp.bfloat16
    assert gw.dtype == jnp.float32
    assert np.isfinite(np.asarray(gv, np.float32)).all()


def test_short_sequence_vs_kernel():
    """T < K: windows clip on both sides."""
    v, w = _inputs(t=4, k=9, seed=2)
    np.testing.assert_allclose(
        np.asarray(depthwise_time_conv(v, w)),
        np.asarray(depthwise_time_conv_reference(v, w)),
        rtol=1e-5, atol=1e-5)
    gv = jax.grad(lambda v: jnp.sum(depthwise_time_conv(v, w) ** 2))(v)
    ov = jax.grad(
        lambda v: jnp.sum(depthwise_time_conv_reference(v, w) ** 2))(v)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov),
                               rtol=1e-5, atol=1e-5)
