"""The opt-in remat train step == the default (no-remat) step, and the
bf16 mixed-precision step stays close to f32 with f32 master params.

jax.checkpoint only changes WHEN the forward is computed (recomputed in
the backward instead of saved), not WHAT — losses and parameter updates
must agree to fp-rounding tolerance for both head families.
"""
import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.models.dsnet import DSNet
from edsnet_tpu.models.dsnet_af import DSNetAF
from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                       af_train_step, make_optimizer)

FEAT = 16
B, N = 2, 14


def _ab_batch(rng):
    s = 2
    return {
        "seq": jnp.asarray(rng.randn(B, N, FEAT).astype(np.float32)),
        "mask": jnp.asarray(np.arange(N)[None, :] < np.asarray([N, 10])[:, None]),
        "video_valid": jnp.ones((B,), bool),
        "cls_pos": jnp.asarray((rng.rand(B, N, s) > 0.8).astype(np.int32)),
        "loc_label": jnp.asarray(rng.randn(B, N, s, 2).astype(np.float32)),
        "neg_eligible": jnp.asarray(rng.rand(B, N, s) > 0.5),
        "inc_eligible": jnp.asarray(rng.rand(B, N, s) > 0.7),
        "num_pos": jnp.full((B,), 3, jnp.int32),
    }


def _state(model, apply_args):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *apply_args)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=make_optimizer(1e-3, 1e-5), constants={})


def _assert_tree_close(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_ab_remat_matches_no_remat():
    rng = np.random.RandomState(0)
    batch = _ab_batch(rng)
    model = DSNet("attention", FEAT, 8, [4, 8], 2, fc_depth=2)
    key = jax.random.PRNGKey(7)
    # fresh state per call: the step donates its input state
    s1, m1 = ab_train_step(_state(model, (batch["seq"], batch["mask"])),
                           batch, key, lambda_reg=1.0, neg_ratio=2.0,
                           inc_ratio=1.0, remat=True)
    s2, m2 = ab_train_step(_state(model, (batch["seq"], batch["mask"])),
                           batch, key, lambda_reg=1.0, neg_ratio=2.0,
                           inc_ratio=1.0, remat=False)
    _assert_tree_close(m1, m2)
    _assert_tree_close(s1.params, s2.params)


def test_af_remat_matches_no_remat():
    rng = np.random.RandomState(1)
    batch = {
        "seq": jnp.asarray(rng.randn(B, N, FEAT).astype(np.float32)),
        "mask": jnp.ones((B, N), bool),
        "video_valid": jnp.ones((B,), bool),
        "target": jnp.asarray((rng.rand(B, N) > 0.7).astype(np.int32)),
        "af_loc": jnp.asarray(np.abs(rng.randn(B, N, 2))
                              .astype(np.float32) + 0.5),
        "af_ctr": jnp.asarray(rng.rand(B, N).astype(np.float32)),
    }
    model = DSNetAF("attention", FEAT, 8, 2, fc_depth=2)
    key = jax.random.PRNGKey(9)
    s1, m1 = af_train_step(_state(model, (batch["seq"], batch["mask"])),
                           batch, key, lambda_reg=1.0, lambda_ctr=1.0,
                           cls_kind="focal", reg_kind="soft-iou",
                           remat=True)
    s2, m2 = af_train_step(_state(model, (batch["seq"], batch["mask"])),
                           batch, key, lambda_reg=1.0, lambda_ctr=1.0,
                           cls_kind="focal", reg_kind="soft-iou",
                           remat=False)
    _assert_tree_close(m1, m2)
    _assert_tree_close(s1.params, s2.params)


def test_ab_bf16_compute_step():
    """bf16 mixed-precision step: finite loss, f32 params updated, and
    within bf16 tolerance of the f32 step."""
    rng = np.random.RandomState(2)
    batch = _ab_batch(rng)
    model = DSNet("nystromformer", FEAT, 8, [4, 8], 2, fc_depth=2)
    key = jax.random.PRNGKey(3)
    s16, m16 = ab_train_step(_state(model, (batch["seq"], batch["mask"])),
                             batch, key, lambda_reg=1.0, neg_ratio=2.0,
                             inc_ratio=1.0, compute_dtype="bfloat16")
    s32, m32 = ab_train_step(_state(model, (batch["seq"], batch["mask"])),
                             batch, key, lambda_reg=1.0, neg_ratio=2.0,
                             inc_ratio=1.0)
    assert np.isfinite(float(m16["loss"]))
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32          # master params stay f32
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=0.05)
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(s16.params),
                                jax.tree.leaves(s32.params)))
    assert delta < 1e-2                            # Adam-step scale: ~lr
