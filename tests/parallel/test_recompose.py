"""On-device batch recomposition: gather-composed step == explicit step.

The trainer composes each epoch's batches by indexing device-resident
length-bucket pools (data/batching.py:pool_items, steps.resolve_batch).
Given the same membership, the gathered batch must produce bit-identical
losses and parameter updates to the explicitly-stacked batch.
"""
import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.data import batching
from edsnet_tpu.models.dsnet import DSNet
from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                       make_optimizer)

FEAT = 16


def _items(n_videos=5, rng=None):
    rng = rng or np.random.RandomState(0)
    items = []
    for i in range(n_videos):
        n = int(rng.choice([10, 14]))
        target = np.zeros(n, np.int32)
        target[2:5] = 1
        items.append(batching.TrainItem(
            key=f"v{i}", seq=rng.randn(n, FEAT).astype(np.float32),
            target=target,
            cls_pos=np.asarray(rng.rand(n, 2) > 0.8, np.int32),
            loc_label=rng.randn(n, 2, 2).astype(np.float32),
            neg_eligible=rng.rand(n, 2) > 0.5,
            inc_eligible=rng.rand(n, 2) > 0.7,
            num_pos=3))
    return items


def _state(model, sample):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.asarray(sample["seq"]),
                           jnp.asarray(sample["mask"]))
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             tx=make_optimizer(1e-3, 1e-5), constants={})


def test_gather_step_matches_explicit_step():
    items = _items()
    pools = batching.pool_items(items, bucket_size=16)
    explicit = list(batching.batch_items(items, batch_size=2,
                                         bucket_size=16, shuffle=False))
    model = DSNet("linear", FEAT, 8, [4, 8], 2, fc_depth=1)
    sample = explicit[0]
    rng = jax.random.PRNGKey(7)

    # compose the same membership as explicit batch 0 via the pool
    pool = None
    idx = None
    for p in pools:
        keys = list(p["keys"])
        if all(k in keys for k in explicit[0]["keys"]):
            pool = {k: jnp.asarray(v) for k, v in p.items()
                    if isinstance(v, np.ndarray)}
            idx = np.asarray([keys.index(k) for k in explicit[0]["keys"]],
                             np.int32)
            break
    assert pool is not None

    state1 = _state(model, sample)
    state2 = _state(model, sample)

    explicit_batch = {k: jnp.asarray(v) for k, v in sample.items()
                      if isinstance(v, np.ndarray)}
    gathered_batch = {"pool": pool, "gather_idx": jnp.asarray(idx),
                      "video_valid": jnp.asarray(sample["video_valid"])}

    s1, m1 = ab_train_step(state1, explicit_batch, rng, lambda_reg=1.0,
                           neg_ratio=2.0, inc_ratio=1.0)
    s2, m2 = ab_train_step(state2, gathered_batch, rng, lambda_reg=1.0,
                           neg_ratio=2.0, inc_ratio=1.0)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for (p1, p2) in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-6, atol=1e-7)
