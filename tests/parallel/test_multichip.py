"""Driver-contract tests: virtual 8-device mesh training + entry compile."""
import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8, (
        "conftest must force an 8-device virtual CPU platform")


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    cls, loc = jax.tree.leaves(out)[0], jax.tree.leaves(out)[1]
    assert np.isfinite(np.asarray(cls)).all()


def test_train_step_batch_parity():
    """Data-parallel loss over 8 devices == single-device loss on the same
    batch (psum/replication correctness)."""
    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.parallel import make_mesh, shard_batch
    from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                           make_optimizer)
    import jax.numpy as jnp

    feat, n, scales = 32, 64, (4,)
    model = get_model(
        "anchor-based", model_depth="shallow", base_model="linear",
        num_feature=feat, num_hidden=8, anchor_scales=scales, num_head=2,
        fc_depth=1, attention_depth=1, encoder_type="classic",
        orientation="paper", pooling_type="roi")
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "seq": rng.randn(b, n, feat).astype(np.float32),
        "mask": np.ones((b, n), bool),
        "video_valid": np.ones((b,), bool),
        "target": np.tile((np.arange(n) % 5 < 2).astype(np.int32), (b, 1)),
        "cls_pos": (rng.rand(b, n, 1) > 0.9).astype(np.int32),
        "loc_label": rng.randn(b, n, 1, 2).astype(np.float32) * 0.1,
        "neg_eligible": rng.rand(b, n, 1) > 0.5,
        "inc_eligible": rng.rand(b, n, 1) > 0.8,
        "num_pos": np.full((b,), 3, np.int32),
    }

    def make_state():
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rngs, jnp.asarray(batch["seq"]),
                               jnp.asarray(batch["mask"]))
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            tx=make_optimizer(1e-4, 0.0),
            constants={k: v for k, v in variables.items() if k != "params"})

    key = jax.random.PRNGKey(7)

    _, m_single = ab_train_step(make_state(), jax.tree.map(jnp.asarray, batch),
                                key, lambda_reg=1.0, neg_ratio=2.0,
                                inc_ratio=1.0)

    mesh = make_mesh(8)
    dev_batch = shard_batch(batch, mesh)
    _, m_mesh = ab_train_step(make_state(), dev_batch, key, lambda_reg=1.0,
                              neg_ratio=2.0, inc_ratio=1.0)

    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_mesh["loss"]), rtol=1e-5)
