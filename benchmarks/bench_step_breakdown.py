"""Anchor-based train-step breakdown: where the milliseconds go.

Compiles each stage of the step as its own chained program and
slope-times it (see bench.py for why naive timing lies on this platform):
negative/incomplete sampling (old argsort vs round-3 radix formulations),
forward, forward+backward, Adam update, and the full fused step.  Stage
times are measured in isolation, so they need not sum exactly to the
fused step (XLA fuses across stage boundaries there) — the table bounds
each component honestly.

Usage: python benchmarks/bench_step_breakdown.py [--batch 8] [--seq 512]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def slope_time(run_k, k1=3, k2=33, reps=5):
    """Median slope of the K-chained program, seconds per iteration."""
    def timed(k):
        t0 = time.perf_counter()
        float(run_k(np.int32(k)))
        return time.perf_counter() - t0

    timed(1)  # compile
    slopes = sorted(max(timed(k2) - timed(k1), 1e-9) / (k2 - k1)
                    for _ in range(reps))
    return slopes[reps // 2]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--feat", type=int, default=1024)
    parser.add_argument("--base-model", type=str, default="nystromformer")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.ops import losses as L
    from edsnet_tpu.parallel.steps import (build_ab_cls_labels,
                                           make_optimizer)
    from edsnet_tpu.utils.runtime import setup_runtime

    setup_runtime()
    b, n, f = args.batch, args.seq, args.feat
    scales = (12,)
    s = len(scales)
    model = get_model(
        "anchor-based", model_depth="shallow", base_model=args.base_model,
        num_feature=f, num_hidden=128, anchor_scales=scales, num_head=8,
        fc_depth=7, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")

    rng = np.random.RandomState(0)
    batch = {
        "seq": jnp.asarray(rng.randn(b, n, f).astype(np.float32)),
        "mask": jnp.ones((b, n), bool),
        "video_valid": jnp.ones((b,), bool),
        "cls_pos": jnp.asarray((rng.rand(b, n, s) > 0.95).astype(np.int32)),
        "loc_label": jnp.asarray(
            rng.randn(b, n, s, 2).astype(np.float32) * 0.1),
        "neg_eligible": jnp.asarray(rng.rand(b, n, s) > 0.5),
        "inc_eligible": jnp.asarray(rng.rand(b, n, s) > 0.8),
        "num_pos": jnp.full((b,), 20, jnp.int32),
    }
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch["seq"], batch["mask"])
    params0 = variables["params"]
    tx = make_optimizer(5e-5, 1e-5)
    opt0 = tx.init(params0)

    def chain(body, x0, reduce_fn):
        @jax.jit
        def run_k(k):
            def f(i, x):
                return body(x, jax.random.fold_in(jax.random.PRNGKey(3), i))
            return reduce_fn(jax.lax.fori_loop(0, k, f, x0))
        return run_k

    results = {}

    # 1. sampling only (round-3 radix formulation)
    def sample_body(x, key):
        lbl = build_ab_cls_labels(batch, key, 2.0, 1.0)
        return x + 0.0 * jnp.sum(lbl)

    results["sampling_ms"] = slope_time(
        chain(sample_body, jnp.float32(0), lambda x: x)) * 1e3

    # 1b. the pre-round-3 argsort formulation, for the delta
    from edsnet_tpu.parallel.steps import \
        _sample_marks_argsort_reference as _sample_marks_argsort

    def argsort_body(x, key):
        neg_rng, inc_rng = jax.random.split(key)
        num_neg = (2.0 * batch["num_pos"]).astype(jnp.int32)
        num_inc = (1.0 * batch["num_pos"]).astype(jnp.int32)
        neg = jax.vmap(_sample_marks_argsort)(
            batch["neg_eligible"], num_neg, jax.random.split(neg_rng, b))
        inc = jax.vmap(_sample_marks_argsort)(
            batch["inc_eligible"], num_inc, jax.random.split(inc_rng, b))
        lbl = jnp.where(neg | inc, -1, batch["cls_pos"])
        return x + 0.0 * jnp.sum(lbl)

    results["sampling_argsort_ms"] = slope_time(
        chain(argsort_body, jnp.float32(0), lambda x: x)) * 1e3

    # 2. forward only (training mode, dropout active)
    def fwd_body(x, key):
        pred_cls, pred_loc = model.apply(
            variables, batch["seq"], batch["mask"], deterministic=False,
            rngs={"dropout": key})
        return x + 0.0 * (jnp.sum(pred_cls) + jnp.sum(pred_loc))

    results["forward_ms"] = slope_time(
        chain(fwd_body, jnp.float32(0), lambda x: x)) * 1e3

    # 3. forward + backward (grads wrt params)
    cls_label = build_ab_cls_labels(batch, jax.random.PRNGKey(9), 2.0, 1.0)

    def fwd(p, key):
        return model.apply({"params": p}, batch["seq"], batch["mask"],
                           deterministic=False, rngs={"dropout": key})

    def loss_fn(p, key):
        pred_cls, pred_loc = fwd(p, key)
        loc = jax.vmap(L.ab_loc_loss)(pred_loc, batch["loc_label"],
                                      cls_label)
        cls = jax.vmap(L.ab_cls_loss)(pred_cls, cls_label)
        return jnp.mean(cls + loc)

    def grad_body(p, key):
        _, grads = jax.value_and_grad(loss_fn)(p, key)
        return jax.tree.map(lambda a, g: a + 0.0 * g, p, grads)

    results["fwd_bwd_ms"] = slope_time(
        chain(grad_body, params0, lambda p: jax.tree.leaves(p)[0].sum()
              )) * 1e3

    # 4. Adam update only (fixed grads)
    grads0 = jax.grad(loss_fn)(params0, jax.random.PRNGKey(4))

    def adam_body(carry, key):
        p, o = carry
        updates, o = tx.update(grads0, o, p)
        return (jax.tree.map(lambda a, u: a + u, p, updates), o)

    results["adam_ms"] = slope_time(
        chain(adam_body, (params0, opt0),
              lambda c: jax.tree.leaves(c[0])[0].sum())) * 1e3

    # 5. full fused step (sampling + fwd + bwd + adam)
    def full_body(carry, key):
        p, o = carry
        drop_rng, label_rng = jax.random.split(key)
        lbl = build_ab_cls_labels(batch, label_rng, 2.0, 1.0)

        def lf(pp):
            pred_cls, pred_loc = fwd(pp, drop_rng)
            loc = jax.vmap(L.ab_loc_loss)(pred_loc, batch["loc_label"],
                                          lbl)
            cls = jax.vmap(L.ab_cls_loss)(pred_cls, lbl)
            return jnp.mean(cls + loc)

        _, grads = jax.value_and_grad(lf)(p)
        updates, o = tx.update(grads, o, p)
        return (jax.tree.map(lambda a, u: a + u, p, updates), o)

    results["full_step_ms"] = slope_time(
        chain(full_body, (params0, opt0),
              lambda c: jax.tree.leaves(c[0])[0].sum())) * 1e3

    results = {k: round(v, 3) for k, v in results.items()}
    results.update(batch=b, seq=n, base_model=args.base_model,
                   backend=jax.default_backend(),
                   frames_per_sec=round(b * n
                                        / (results["full_step_ms"] / 1e3)))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
