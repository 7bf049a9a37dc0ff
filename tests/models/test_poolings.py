"""Fused windowed-linear poolings must equal the gather-windows oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.models.poolings import Pooling, extract_windows, roi_avg_pool


def _torchless_avgpool_oracle(x, scale):
    """AvgPool1d(scale, stride=1, pad=scale//2, count_include_pad) oracle."""
    b, n, h = x.shape
    p = scale // 2
    xp = np.zeros((b, n + 2 * p, h), x.dtype)
    xp[:, p:p + n] = x
    out = np.zeros((b, n + 2 * p - scale + 1, h), x.dtype)
    for i in range(out.shape[1]):
        out[:, i] = xp[:, i:i + scale].mean(axis=1)
    return out[:, :n]


def test_roi_avg_pool_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 37, 8).astype(np.float32)
    for scale in (4, 8, 12):
        ours = np.asarray(roi_avg_pool(jnp.asarray(x), scale))
        oracle = _torchless_avgpool_oracle(x, scale)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_extract_windows_reference_semantics():
    """Window i covers [max(0, i-s//2+1), min(i+s//2, N-1)], zero-padded at
    the END (poolings.py:22-27)."""
    n, s = 7, 4
    x = np.arange(1, n + 1, dtype=np.float32).reshape(1, n, 1)
    w = np.asarray(extract_windows(jnp.asarray(x), s))[0, :, :, 0]
    # position 0: start=max(0,-1)=0, end=min(2,6)=2 -> [1,2,3,0]
    np.testing.assert_allclose(w[0], [1, 2, 3, 0])
    # position 3 (interior): [3,4,5,6]
    np.testing.assert_allclose(w[3], [3, 4, 5, 6])
    # position 6: start=5, end=min(8,6)=6 -> [6,7,0,0]
    np.testing.assert_allclose(w[6], [6, 7, 0, 0])


@pytest.mark.parametrize("pooling_type", ["fft", "dwt", "flat-pooling"])
@pytest.mark.parametrize("scale", [4, 8])
def test_fused_matches_gather_short_sequence(pooling_type, scale):
    """N shorter than the window's left reach (n < s//2 - 1).

    Regression: windowed_linear's left-edge fix-up wrote an [B, off, O]
    block into a y with only n < off rows and crashed with a shape
    mismatch.  Unreachable via the bucketed batch paths (N >= 64) but
    live for direct callers (e.g. unbatched infer on a very short clip)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 2, 16).astype(np.float32))

    fused = Pooling((scale,), pooling_type, 8, fused=True)
    plain = Pooling((scale,), pooling_type, 8, fused=False)
    variables = fused.init(jax.random.PRNGKey(0), x)
    for a, b in zip(fused.apply(variables, x), plain.apply(variables, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("pooling_type", ["fft", "dwt", "flat-pooling"])
@pytest.mark.parametrize("scale", [4, 8])
def test_fused_matches_gather(pooling_type, scale):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32))

    fused = Pooling((scale,), pooling_type, 8, fused=True)
    plain = Pooling((scale,), pooling_type, 8, fused=False)
    variables = fused.init(jax.random.PRNGKey(0), x)

    out_f = fused.apply(variables, x)
    out_p = plain.apply(variables, x)
    assert len(out_f) == len(out_p)
    for a, b in zip(out_f, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
