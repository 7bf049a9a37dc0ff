"""Compiled-cost roofline for the production train step.

Answers VERDICT r4 #3's closing question — is the ~1.1 ms step target
reachable, or is the measured step already at the machine's floor? —
with numbers from XLA's own post-fusion cost model instead of hand
FLOP-counting:

    python benchmarks/bench_hlo_cost.py                # cost model only
    python benchmarks/bench_hlo_cost.py --measure      # + slope-timed ms

For each compute dtype (f32 and the production bf16 mixed-precision
config) it compiles the REAL ``ab_train_step`` (parallel/steps.py — the
same jitted program the trainer dispatches, donation and all) at the
paper config (nystromformer, B=8, N=512, 1024 feats) and reports:

- ``gflops``:        executable FLOPs from ``compiled.cost_analysis()``
- ``gbytes``:        bytes accessed (operands + outputs, post-fusion).
  This UPPER-BOUNDS true HBM traffic: a value consumed by several
  fusions is counted once per consumer even when it stays resident in
  VMEM/caches, so the HBM floor derived from it is conservative.
- ``intensity``:     flops / bytes — v5e needs ~240 flops/byte to turn
  compute-bound, so the step's ~35 (f32) confirms it is HBM-bound and
  that traffic reduction (bf16, fused heads) is the right lever.
- ``floor_ms``:      max(HBM time, MXU time) on v5e
  (819 GB/s HBM, 197 bf16 TFLOP/s — f32 inputs run bf16 MXU passes at
  default matmul precision)
- ``measured_ms`` / ``floor_frac`` (``--measure``): slope-timed step and
  what fraction of it the roofline floor explains.  floor_frac near 1
  is the written "floor is reached" argument; well below ~0.5 means
  headroom the schedule is leaving on the table.

Cost analysis is backend-specific (fusion differs), so CPU runs are a
structural proxy; the watchdog's on-chip batch (tools/
onchip_validation.sh) records the authoritative TPU numbers.
Reference scope: the host loop this step replaces is
/root/reference/src/anchor_based/train.py:77-131.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def build(batch_size: int, seq: int, feat: int, base_model: str):
    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.parallel.steps import TrainState, make_optimizer

    model = get_model(
        "anchor-based", model_depth="shallow", base_model=base_model,
        num_feature=feat, num_hidden=128, anchor_scales=(12,), num_head=8,
        fc_depth=7, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")

    b, n, f, s = batch_size, seq, feat, 1
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
    constants = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(5e-5, 1e-5), constants=constants or None)
    return state, batch


def analyze(state, batch, compute_dtype: str, measure: bool, steps: int):
    import jax

    from edsnet_tpu.parallel.steps import ab_train_step

    kw = dict(lambda_reg=1.0, neg_ratio=2.0, inc_ratio=1.0,
              compute_dtype=compute_dtype)
    rng = jax.random.PRNGKey(3)
    lowered = jax.jit(
        lambda st, b, r: ab_train_step(st, b, r, **kw)).lower(
            state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):   # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    gbytes = float(cost.get("bytes accessed", 0.0)) / 1e9
    hbm_ms = gbytes / V5E_HBM_GBPS * 1e3
    mxu_ms = flops / 1e12 / V5E_BF16_TFLOPS * 1e3
    out = {
        "compute_dtype": compute_dtype,
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(gbytes, 3),
        "intensity_flops_per_byte": round(flops / max(gbytes * 1e9, 1), 1),
        "floor_ms": round(max(hbm_ms, mxu_ms), 3),
        "floor_bound": "hbm" if hbm_ms >= mxu_ms else "mxu",
    }
    if measure:
        # fori-chained slope timing (excludes per-dispatch tunnel cost,
        # like bench_train_step.py); the outer jit drops the inner
        # step's donation so `state` stays valid for the next dtype row
        import jax.numpy as jnp

        @jax.jit
        def run_k(st, k):
            def body(i, st):
                st2, _ = ab_train_step(
                    st, batch, jax.random.fold_in(rng, i), **kw)
                return st2
            st = jax.lax.fori_loop(0, k, body, st)
            return jax.tree.leaves(st.params)[0].sum()

        def timed(k):
            t0 = time.perf_counter()
            float(run_k(state, jnp.int32(k)))
            return time.perf_counter() - t0

        timed(1)   # warm
        slopes = sorted(max(timed(3 + steps) - timed(3), 1e-9)
                        for _ in range(5))
        dt = slopes[2]
        out["measured_ms"] = round(dt / steps * 1e3, 3)
        out["floor_frac"] = round(out["floor_ms"] / out["measured_ms"], 3)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--feat", type=int, default=1024)
    parser.add_argument("--base-model", type=str, default="nystromformer")
    parser.add_argument("--measure", action="store_true",
                        help="also slope-time the step (needs a "
                             "responsive device)")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--device", type=str, default="auto",
                        help="auto|cpu|tpu — cpu forces the host backend "
                             "(the axon plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    import jax

    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(device=args.device)

    state, batch = build(args.batch, args.seq, args.feat, args.base_model)
    rows = [analyze(state, batch, cd, args.measure, args.steps)
            for cd in ("float32", "bfloat16")]
    print(json.dumps({
        "metric": "train_step_roofline",
        "backend": jax.default_backend(),
        "batch": args.batch, "seq": args.seq,
        "base_model": args.base_model,
        "v5e": {"hbm_gbps": V5E_HBM_GBPS, "bf16_tflops": V5E_BF16_TFLOPS},
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
