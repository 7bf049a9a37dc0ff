"""Model shape smoke tests + masked-batch parity.

Extends the reference tests/modules/test_models.py (tiny random sequence
through both heads, shape assertions) across the full backbone zoo, and adds
the TPU-specific invariant the reference never needed: a padded, masked
bucket must reproduce the unpadded forward at every real position (exact for
position-independent mixers; spectral mixers are length-dependent by design
and excluded).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.models.base import BASE_MODELS, build_base_model
from edsnet_tpu.models.model_zoo import get_model

FEAT = 64
HEADS = 4


def _init_and_run(model, *args, **kwargs):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *args, **kwargs)
    out = model.apply(variables, *args, **kwargs)
    return variables, out


@pytest.mark.parametrize("base", BASE_MODELS)
def test_base_model_shapes(base):
    model = build_base_model(base, FEAT, HEADS)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, FEAT))
    _, out = _init_and_run(model, x)
    assert out.shape == (2, 32, FEAT)
    assert np.isfinite(np.asarray(out)).all()


# since round 2 the invariant holds for EVERY backbone: spectral mixers
# compute the true-length DFT / pywt boundary, and nystromformer emulates
# the reference's per-video front-pad landmark grouping analytically
# (models/nystromformer.py:nystrom_core_jnp)
MASK_EXACT = BASE_MODELS


@pytest.mark.parametrize("n_real", [24, 23])   # 23: odd-length dwt boundary
@pytest.mark.parametrize("base", MASK_EXACT)
def test_masked_padding_parity(base, n_real):
    """Padded+masked forward == unpadded forward at real positions."""
    n_bucket = 32
    model = build_base_model(base, FEAT, HEADS)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, n_real, FEAT))
    variables, out_exact = _init_and_run(model, x)

    x_pad = jnp.pad(x, ((0, 0), (0, n_bucket - n_real), (0, 0)))
    mask = jnp.arange(n_bucket)[None, :] < n_real
    out_pad = model.apply(variables, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_pad)[0, :n_real],
                               np.asarray(out_exact)[0], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("orientation", ["temporal", "feature_wise", "paper"])
def test_masked_padding_parity_fourier_orientations(orientation):
    n_real, n_bucket = 21, 32
    model = build_base_model("fourier", FEAT, HEADS, orientation)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, n_real, FEAT))
    variables, out_exact = _init_and_run(model, x)
    x_pad = jnp.pad(x, ((0, 0), (0, n_bucket - n_real), (0, 0)))
    mask = jnp.arange(n_bucket)[None, :] < n_real
    out_pad = model.apply(variables, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_pad)[0, :n_real],
                               np.asarray(out_exact)[0], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("base", ["attention", "lstm", "fourier", "dwt"])
def test_masked_padding_parity_local_global(base):
    """Segment boundaries must come from the TRUE length, so a padded
    local-global encoder reproduces the unpadded one at real positions
    (reference boundary rule: ceil(n / num_segments), encoder.py:46)."""
    from edsnet_tpu.models.encoder import LocalGlobalEncoder
    n_real, n_bucket = 27, 32
    model = LocalGlobalEncoder(base, "paper", FEAT, num_head=HEADS,
                               num_segments=4, local_attention_head=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, n_real, FEAT))
    variables, out_exact = _init_and_run(model, x)
    x_pad = jnp.pad(x, ((0, 0), (0, n_bucket - n_real), (0, 0)))
    mask = jnp.arange(n_bucket)[None, :] < n_real
    out_pad = model.apply(variables, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_pad)[0, :n_real],
                               np.asarray(out_exact)[0], rtol=2e-4, atol=2e-4)


def _head_kwargs(**over):
    kw = dict(base_model="attention", num_feature=FEAT, num_hidden=16,
              anchor_scales=[4, 8], num_head=HEADS, fc_depth=2,
              attention_depth=2, encoder_type="classic",
              orientation="paper", pooling_type="roi")
    kw.update(over)
    return kw


@pytest.mark.parametrize("depth", ["shallow", "deep",
                                   "local-global-attention", "original"])
def test_anchor_based_heads(depth):
    model = get_model("anchor-based", model_depth=depth, **_head_kwargs())
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, FEAT))
    variables, (cls, loc) = _init_and_run(model, x)
    assert cls.shape == (1, 30, 2)
    assert loc.shape == (1, 30, 2, 2)
    pc, boxes = model.apply(variables, x, method="predict")
    assert pc.shape == (1, 60)
    assert boxes.shape == (1, 60, 2)


@pytest.mark.parametrize("pooling", ["fft", "dwt", "flat-pooling"])
def test_anchor_based_poolings(pooling):
    model = get_model("anchor-based", model_depth="shallow",
                      **_head_kwargs(anchor_scales=[8], pooling_type=pooling))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, FEAT))
    _, (cls, loc) = _init_and_run(model, x)
    assert cls.shape == (1, 30, 1)
    assert loc.shape == (1, 30, 1, 2)


@pytest.mark.parametrize("depth", ["shallow", "deep",
                                   "local-global-attention", "original"])
def test_anchor_free_heads(depth):
    model = get_model("anchor-free", model_depth=depth, **_head_kwargs())
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, FEAT))
    variables, (cls, loc, ctr) = _init_and_run(model, x)
    assert cls.shape == (1, 30)
    assert loc.shape == (1, 30, 2)
    assert ctr.shape == (1, 30)
    assert (np.asarray(loc) > 0).all()  # exp-activated extents
    pc, boxes = model.apply(variables, x, method="predict")
    assert pc.shape == (1, 30)
    assert boxes.shape == (1, 30, 2)
    assert np.asarray(pc).max() <= 1.0 + 1e-5


def test_cross_attention_motion_head():
    model = get_model("anchor-based", model_depth="cross-attention",
                      **_head_kwargs(num_feature=1024, anchor_scales=[4]))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 1024))
    motion = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 1024))
    variables, (cls, loc) = _init_and_run(model, x, motion)
    assert cls.shape == (1, 16, 1)
    assert loc.shape == (1, 16, 1, 2)


def test_performer_batch_composition_independence():
    """One video's output must not depend on what it is co-batched with.

    Regression: the FAVOR+ key stabilizer was a single global max over
    the whole batch (the reference's semantics, performer.py:66) — an
    outlier co-batched video raised it enough to push every exp() below
    the ``+ eps`` floor, degrading attention toward a uniform average of
    v (max-abs drift 0.91 measured).  The stabilizer is now per batch
    element over valid positions, which cancels in the attention ratio."""
    model = build_base_model("performer", FEAT, HEADS)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 24, FEAT))
    variables, out_alone = _init_and_run(model, x)

    outlier = 40.0 * jax.random.normal(jax.random.PRNGKey(8), (1, 24, FEAT))
    out_pair = model.apply(variables, jnp.concatenate([x, outlier], axis=0))
    np.testing.assert_allclose(np.asarray(out_pair)[0],
                               np.asarray(out_alone)[0],
                               rtol=1e-6, atol=1e-6)


def test_gcn_grads_finite_under_padding():
    """Padded rows have degree 0; the D^-1/2 normalization must not turn
    that into NaN gradients (the classic double-where trap: the untaken
    1/sqrt(0) branch's inf derivative times a zero cotangent is NaN,
    poisoning the WHOLE step's gradients, not just the padded rows)."""
    from edsnet_tpu.models.gcn import GCNExtractor

    f = 8
    model = GCNExtractor(f)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 12, f))
    mask = jnp.arange(12)[None, :] < jnp.array([12, 7])[:, None]
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, mask)

    def loss(params):
        out = model.apply({"params": params}, x, mask)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads)), "NaN/inf in GCN grads"


def test_l2_normalize_zero_row_grads_finite():
    """An all-zero row (dead-relu upstream) must not NaN the gradients:
    norm's derivative at 0 is inf, and even a zero cotangent routed
    through a plain maximum turns it into NaN."""
    from edsnet_tpu.models.common import l2_normalize

    x = jnp.array([[1.0, 2.0], [0.0, 0.0]])
    out = l2_normalize(x)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray(x[0] / jnp.linalg.norm(x[0])))
    assert np.asarray(out)[1].tolist() == [0.0, 0.0]
    g = jax.grad(lambda v: jnp.sum(l2_normalize(v)[0]))(x)
    assert np.isfinite(np.asarray(g)).all(), g


def test_invalid_configs_fail_loudly():
    """Head/feature mismatches and odd dwt windows raise clear errors
    instead of opaque reshape failures deep inside XLA (the reference
    crashes in a .view() for odd dwt scales, poolings.py:33)."""
    from edsnet_tpu.models.poolings import Pooling

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 30))
    with pytest.raises(ValueError, match="divisible by num_head"):
        _init_and_run(build_base_model("attention", 30, 4), x)
    with pytest.raises(ValueError, match="even num_feature"):
        _init_and_run(build_base_model("bilstm", 31, 2),
                      jax.random.normal(jax.random.PRNGKey(0), (1, 16, 31)))
    with pytest.raises(ValueError, match="even --anchor-scales"):
        _init_and_run(Pooling(scales=(5,), pooling_type="dwt",
                              num_hidden=8),
                      jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8)))


def test_dropout_stochastic_in_train_mode():
    model = get_model("anchor-based", model_depth="shallow", **_head_kwargs())
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, FEAT))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    out1, _ = model.apply(variables, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    out2, _ = model.apply(variables, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
