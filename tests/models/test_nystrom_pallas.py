"""Pallas fused Nystromformer kernel vs the jnp reference core."""
import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.kernels.nystrom_pallas import nystrom_attention_pallas
from edsnet_tpu.models.base import build_base_model
from edsnet_tpu.models.nystromformer import nystrom_core_jnp

B, H, N, D, M = 2, 2, 128, 16, 64


def _qkv(partial_mask: bool):
    rng = np.random.RandomState(0)
    q = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    k = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(B, H, N, D).astype(np.float32)
    mask = np.ones((B, N), bool)
    if partial_mask:
        mask[0, 100:] = False
        mask[1, 70:] = False
    mf = mask[:, None, :, None]
    return (jnp.asarray(q * mf), jnp.asarray(k * mf), jnp.asarray(v * mf),
            jnp.asarray(mask))


def test_pallas_matches_jnp_full_mask():
    q, k, v, mask = _qkv(partial_mask=False)
    ref = nystrom_core_jnp(q, k, v, mask, M, 6)
    out = nystrom_attention_pallas(q, k, v, mask, num_landmarks=M,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=2e-3)


def test_pallas_matches_jnp_partial_mask():
    q, k, v, mask = _qkv(partial_mask=True)
    ref = nystrom_core_jnp(q, k, v, mask, M, 6)
    out = nystrom_attention_pallas(q, k, v, mask, num_landmarks=M,
                                   interpret=True)
    valid = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(ref) * valid,
                               rtol=1e-2, atol=2e-3)


def test_module_pallas_flag_matches():
    model_ref = build_base_model("nystromformer", 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    mask = jnp.arange(64)[None, :] < 50
    variables = model_ref.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, mask)
    out_ref = model_ref.apply(variables, x, mask)

    model_pl = model_ref.clone(use_pallas=True)
    out_pl = model_pl.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out_pl)[:, :50],
                               np.asarray(out_ref)[:, :50],
                               rtol=1e-2, atol=2e-3)
