"""Train-step throughput benchmark (full jitted step: on-device negative
sampling, forward, masked losses, grads, Adam update).

Usage: python benchmarks/bench_train_step.py [--batch 8] [--seq 512]
Slope timing (see bench.py) over K steps chained through the train state.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--feat", type=int, default=1024)
    parser.add_argument("--base-model", type=str, default="nystromformer")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--compute-dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = the production TPU mixed-"
                             "precision config (--compute-dtype auto)")
    parser.add_argument("--device", type=str, default="auto",
                        help="auto|cpu|tpu — cpu forces the host backend "
                             "(the axon plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.ops import losses as L
    from edsnet_tpu.parallel.steps import (build_ab_cls_labels,
                                           make_optimizer)
    from edsnet_tpu.utils.runtime import setup_runtime

    setup_runtime(device=args.device)
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

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch["seq"], batch["mask"])
    tx = make_optimizer(5e-5, 1e-5)
    params0 = variables["params"]
    opt0 = tx.init(params0)

    cd = jnp.dtype(args.compute_dtype)

    def one_step(carry, key):
        params, opt = carry
        drop_rng, label_rng = jax.random.split(key)
        cls_label = build_ab_cls_labels(batch, label_rng, 2.0, 1.0)

        def loss_fn(p):
            if cd != jnp.float32:   # mirror steps.py mixed precision
                p = jax.tree.map(
                    lambda t: t.astype(cd)
                    if jnp.issubdtype(t.dtype, jnp.floating) else t, p)
            pred_cls, pred_loc = model.apply(
                {"params": p}, batch["seq"].astype(cd), batch["mask"],
                deterministic=False, rngs={"dropout": drop_rng})
            pred_cls = pred_cls.astype(jnp.float32)
            pred_loc = pred_loc.astype(jnp.float32)
            loc = jax.vmap(L.ab_loc_loss)(pred_loc, batch["loc_label"],
                                          cls_label)
            cls = jax.vmap(L.ab_cls_loss)(pred_cls, cls_label)
            return jnp.mean(cls + loc)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt), loss

    @jax.jit
    def run_k(params, opt, k):
        def body(i, carry):
            key = jax.random.fold_in(jax.random.PRNGKey(3), i)
            carry, _ = one_step(carry, key)
            return carry
        params, opt = jax.lax.fori_loop(0, k, body, (params, opt))
        return jax.tree.leaves(params)[0].sum()

    def timed(k):
        t0 = time.perf_counter()
        float(run_k(params0, opt0, jnp.int32(k)))
        return time.perf_counter() - t0

    float(run_k(params0, opt0, jnp.int32(1)))
    # median of 5 slopes (see bench.py: tunnel variance)
    k1, k2 = 3, 3 + args.steps
    slopes = sorted(max(timed(k2) - timed(k1), 1e-9) for _ in range(5))
    dt = slopes[2]
    print(json.dumps({
        "metric": "train_step",
        "base_model": args.base_model,
        "compute_dtype": args.compute_dtype,
        "ms_per_step": round(dt / args.steps * 1e3, 3),
        "frames_per_sec": round(b * n * args.steps / dt),
        "batch": b, "seq": n,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
