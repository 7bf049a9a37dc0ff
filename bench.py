"""Benchmark: frames-scored/sec of the flagship scoring pipeline on TPU.

Measures the jitted batched forward+decode (anchor-based DSNet,
nystromformer backbone, ROI pooling, anchor_scales=12 — the paper config at
reference README.md:57) and compares against a PyTorch-CPU batch-size-1
baseline equivalent to the reference's execution model (torch is the only
executable baseline in this image; the reference's own GPU numbers are not
published — see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Wedge survival (round 4): the tunneled TPU can wedge so hard that even a
2x2 matmul never returns, and round 3's driver run recorded value=0
because the single 90s probe happened to overlap a wedge.  The default
entry point is now an ORCHESTRATOR: it probes the accelerator in a
subprocess, retries through wedges for up to ~30 min
(EDSNET_BENCH_BUDGET_S), runs the actual measurement in a subprocess
(`bench.py --measure`) so a mid-run wedge cannot hang the driver, caches
every good result to benchmarks/bench_cache.json, and on persistent
wedge emits the last-known-good cached result with an explicit
`stale: true` + timestamp instead of a zero.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

import numpy as np

CACHE_PATH = Path(__file__).parent / "benchmarks" / "bench_cache.json"

SEQ_LEN = 512          # typical TVSum video is a few hundred picks
BATCH = 8
FEAT = 1024
STEPS = 20
WARMUP = 3


def _timed_chain(k: int, run_k, x0) -> float:
    """Run a k-iteration jitted chain and fence with a scalar fetch."""
    t0 = time.perf_counter()
    out = run_k(x0, jnp_int32(k))
    _ = float(out)  # device_get is the only reliable fence on this stack
    return time.perf_counter() - t0


def jnp_int32(v):
    import jax.numpy as jnp
    return jnp.asarray(v, jnp.int32)


def _flagship_model():
    from edsnet_tpu.models.model_zoo import get_model
    return get_model(
        "anchor-based", model_depth="shallow", base_model="nystromformer",
        num_feature=FEAT, num_hidden=128, anchor_scales=(12,), num_head=8,
        fc_depth=7, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")


def bench_ours(return_flops: bool = False):
    """Slope-based timing: K predict steps inside one jitted fori_loop,
    throughput from (t(K2) - t(K1)) / (K2 - K1).

    Rationale: on tunneled platforms `block_until_ready` can return before
    device completion and a host sync can cost seconds; running the whole
    chain device-side and differencing two chain lengths cancels both the
    dispatch and the sync overhead.
    """
    import jax
    import jax.numpy as jnp

    model = _flagship_model()

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(BATCH, SEQ_LEN, FEAT).astype(np.float32))
    mask = jnp.ones((BATCH, SEQ_LEN), bool)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x0, mask)

    def body(i, x):
        cls, boxes = model.apply(variables, x, mask, method="predict")
        # feed a zero-scaled summary of the output back into the input so
        # every iteration depends on the previous one
        return x + 0.0 * (jnp.sum(cls) + jnp.sum(boxes))

    @jax.jit
    def run_k(x, k):
        x = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(x[0, 0])

    for _ in range(WARMUP):
        float(run_k(x0, jnp_int32(1)))

    # median of 5 slope estimates over a long chain: the tunneled platform
    # shows run-to-run variance of +-20%; the median is robust to both
    # slow outliers (noise inflates t2) and fast ones (noise deflates the
    # difference), where min/max would bias the estimate
    k1, k2 = 5, 105
    slopes = []
    for _ in range(5):
        t1 = _timed_chain(k1, run_k, x0)
        t2 = _timed_chain(k2, run_k, x0)
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-9))
    step_time = float(np.median(slopes))
    throughput = BATCH * SEQ_LEN / step_time
    if not return_flops:
        return throughput

    # model FLOPs of ONE predict step from the compiled module's own cost
    # analysis (single-step program: the fori chain would multiply by k)
    predict = jax.jit(
        lambda v, x: model.apply(v, x, mask, method="predict"))
    flops = None
    try:
        cost = predict.lower(variables, x0).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    return throughput, step_time, flops


def bench_train_step(compute_dtype: str = "float32") -> float:
    """Full jitted AB train step (on-device sampling, forward, masked
    losses, grads, Adam) — seconds per step, slope-timed.

    ``compute_dtype='bfloat16'`` mirrors the production
    ``--compute-dtype bfloat16`` mixed-precision path (f32 master params
    and optimizer, bf16 forward/backward — parallel/steps.py)."""
    import jax
    import jax.numpy as jnp

    from edsnet_tpu.ops import losses as L
    from edsnet_tpu.parallel.steps import (_cast_floats, build_ab_cls_labels,
                                           make_optimizer)

    cd = jnp.dtype(compute_dtype)

    b, n, f = BATCH, SEQ_LEN, FEAT
    s = 1
    model = _flagship_model()
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
    tx = make_optimizer(5e-5, 1e-5)
    params0, opt0 = variables["params"], None
    opt0 = tx.init(params0)

    def one_step(carry, key):
        params, opt = carry
        drop_rng, label_rng = jax.random.split(key)
        cls_label = build_ab_cls_labels(batch, label_rng, 2.0, 1.0)

        def loss_fn(p):
            if cd != jnp.float32:
                p = _cast_floats(p, cd)
            pred_cls, pred_loc = model.apply(
                {"params": p}, batch["seq"].astype(cd), batch["mask"],
                deterministic=False, rngs={"dropout": drop_rng})
            pred_cls, pred_loc = (pred_cls.astype(jnp.float32),
                                  pred_loc.astype(jnp.float32))
            loc = jax.vmap(L.ab_loc_loss)(pred_loc, batch["loc_label"],
                                          cls_label)
            cls = jax.vmap(L.ab_cls_loss)(pred_cls, cls_label)
            return jnp.mean(cls + loc)

        _, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt

    @jax.jit
    def run_k(k):
        def body(i, carry):
            return one_step(carry, jax.random.fold_in(jax.random.PRNGKey(3),
                                                      i))
        params, _ = jax.lax.fori_loop(0, k, body, (params0, opt0))
        return jax.tree.leaves(params)[0].sum()

    float(run_k(jnp_int32(1)))
    k1, k2 = 3, 33
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run_k(jnp_int32(k1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_k(jnp_int32(k2)))
        t2 = time.perf_counter() - t0
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-9))
    return float(np.median(slopes))


def bench_eval_program() -> tuple:
    """Full on-device eval program (predict + NMS + keyshot knapsack +
    F-score) — (seconds per batch, frames per batch), dispatch-chained."""
    import jax

    from edsnet_tpu.data.dataset import VideoRecord
    from edsnet_tpu.parallel.eval_device import (eval_fscore_device,
                                                 prepare_eval_batches)

    model = _flagship_model()
    rng = np.random.RandomState(0)
    records = []
    for i in range(BATCH):
        n_seq = SEQ_LEN - 16 * (i % 3)
        n_frames = n_seq * 15
        seq = rng.randn(n_seq, FEAT).astype(np.float32)
        bounds = np.linspace(0, n_frames, 21, dtype=np.int32)
        records.append(VideoRecord(
            key=f"tvsum/v{i}", seq=seq,
            gtscore=rng.rand(n_seq).astype(np.float32),
            cps=np.stack([bounds[:-1], bounds[1:] - 1], 1),
            n_frames=n_frames, nfps=bounds[1:] - bounds[:-1],
            picks=np.arange(n_seq, dtype=np.int32) * 15,
            user_summary=(rng.rand(3, n_frames) > 0.8).astype(np.float32)))

    import jax.numpy as jnp
    mask = jnp.ones((1, SEQ_LEN), bool)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(
        rngs, jnp.zeros((1, SEQ_LEN, FEAT), jnp.float32), mask)
    prepared = prepare_eval_batches(records, BATCH, 64)
    frames = sum(r.seq.shape[0] for r in records)

    def run_k(k):
        out = None
        for _ in range(k):
            out = eval_fscore_device(model, variables, prepared, 0.5)
        return float(out)   # device executes in order; last fences all

    run_k(1)
    k1, k2 = 2, 12
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_k(k1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_k(k2)
        t2 = time.perf_counter() - t0
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-9))
    per_pass = float(np.median(slopes))
    n_batches = len(prepared)
    return per_pass / max(n_batches, 1), frames / per_pass


def bench_torch_baseline(budget_s: float = 60.0) -> float:
    """Reference-style execution: torch CPU, batch-1 python loop, same
    nystromformer-DSNet architecture and sizes."""
    import torch
    from torch import nn

    torch.set_num_threads(max(torch.get_num_threads(), 1))

    heads, dim_head, landmarks = 8, 64, 64
    inner = heads * dim_head

    class TorchNystromDSNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_qkv = nn.Linear(FEAT, inner * 3, bias=False)
            self.to_out = nn.Linear(inner, FEAT)
            self.res_conv = nn.Conv2d(heads, heads, (33, 1),
                                      padding=(16, 0), groups=heads,
                                      bias=False)
            self.norm = nn.LayerNorm(FEAT)
            self.fc1 = nn.Linear(FEAT, 128)
            self.fc_block = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                          nn.LayerNorm(128))
            self.pool = nn.AvgPool1d(12, stride=1, padding=6)
            self.fc_cls = nn.Linear(128, 1)
            self.fc_loc = nn.Linear(128, 2)

        def forward(self, x):
            b, n, _ = x.shape
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)

            def split(t):
                return t.view(b, n, heads, dim_head).permute(0, 2, 1, 3)

            q, k, v = split(q) * dim_head ** -0.5, split(k), split(v)
            m = landmarks
            l = max(n // m, 1)
            q_l = q.reshape(b, heads, m, l, dim_head).mean(dim=3)
            k_l = k.reshape(b, heads, m, l, dim_head).mean(dim=3)
            s1 = (q @ k_l.transpose(-1, -2)).softmax(-1)
            s2 = (q_l @ k_l.transpose(-1, -2)).softmax(-1)
            s3 = (q_l @ k.transpose(-1, -2)).softmax(-1)
            z = s2.transpose(-1, -2) / (s2.abs().sum(-1).max()
                                        * s2.abs().sum(-2).max())
            eye = torch.eye(m)
            for _ in range(6):
                xz = s2 @ z
                z = 0.25 * z @ (13 * eye - xz @ (15 * eye - xz @ (7 * eye - xz)))
            out = (s1 @ z) @ (s3 @ v) + self.res_conv(v)
            out = out.permute(0, 2, 1, 3).reshape(b, n, inner)
            out = self.to_out(out)
            out = self.norm(out + x)
            h = self.fc1(out)
            for _ in range(7):
                h = self.fc_block(h)
            pooled = self.pool(h.transpose(2, 1)).transpose(2, 1)[:, :n]
            return torch.sigmoid(self.fc_cls(pooled)), self.fc_loc(pooled)

    model = TorchNystromDSNet().eval()
    x = torch.randn(1, SEQ_LEN, FEAT)
    with torch.no_grad():
        model(x)  # warmup
        n_iter = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s and n_iter < BATCH * STEPS:
            model(x)
            n_iter += 1
        dt = time.perf_counter() - t0
    return (n_iter * SEQ_LEN) / dt


V5E_BF16_PEAK = 197e12   # TPU v5e peak bf16 FLOP/s (public spec)


def _device_responsive(timeout_s: int = 90) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard timeout.

    The tunneled TPU platform can wedge so completely that even a 2x2
    matmul never returns (and no in-process timeout can recover a stuck
    device_get) — probing in a child process keeps this process able to
    report the failure instead of hanging the whole bench run.
    """
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((64, 64));"
            "print(float((x @ x).sum()))")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=timeout_s)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def measure():
    """Run the actual measurements and print the JSON line (fresh run)."""
    import jax

    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime()   # persistent XLA compile cache across bench runs

    ours, predict_s, flops = bench_ours(return_flops=True)
    extras = {}
    try:
        train_s = bench_train_step()
        extras["train"] = {"ms_per_step": round(train_s * 1e3, 3),
                           "frames_per_sec": round(BATCH * SEQ_LEN
                                                   / train_s)}
    except Exception as e:
        extras["train"] = {"error": str(e)[:120]}
    try:
        # the production --compute-dtype bfloat16 mixed-precision config
        # (converged-quality-neutral per the multi-seed study; RESULTS.md)
        train_bf16_s = bench_train_step("bfloat16")
        extras["train_bf16"] = {
            "ms_per_step": round(train_bf16_s * 1e3, 3),
            "frames_per_sec": round(BATCH * SEQ_LEN / train_bf16_s)}
    except Exception as e:
        extras["train_bf16"] = {"error": str(e)[:120]}
    try:
        eval_s, eval_fps = bench_eval_program()
        # dispatch-chained (host dispatches each batch program), so this
        # INCLUDES per-batch tunnel dispatch cost, unlike the fori-chained
        # predict/train numbers; the async trainer amortizes it
        extras["eval"] = {"ms_per_batch_incl_dispatch":
                          round(eval_s * 1e3, 3),
                          "frames_per_sec": round(eval_fps)}
    except Exception as e:
        extras["eval"] = {"error": str(e)[:120]}
    if flops:
        # MFU against the v5e bf16 peak: the default matmul precision on
        # TPU runs bf16 MXU passes for f32 inputs
        extras["mfu"] = {
            "predict_flops_per_step": round(flops),
            "pct_of_bf16_peak": round(
                100.0 * flops / predict_s / V5E_BF16_PEAK, 2),
        }
    # precision study: force full-f32 accumulation and re-measure predict
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
        extras["precision"] = {
            "highest_frames_per_sec": round(bench_ours(), 2)}
    except Exception as e:
        extras["precision"] = {"error": str(e)[:120]}
    finally:
        try:
            jax.config.update("jax_default_matmul_precision", None)
        except Exception:
            pass
    try:
        base = bench_torch_baseline()
        vs = ours / base
    except Exception:
        base = None
        vs = 0.0
    print(json.dumps({
        "metric": "frames_scored_per_sec",
        "value": round(ours, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
        **extras,
    }))


def _load_cache():
    """Last-known-good result: bench_cache.json (refreshed on every good
    run), falling back to the newest driver-recorded BENCH_r*.json with a
    nonzero value (those are real measurements from prior rounds)."""
    try:
        c = json.loads(CACHE_PATH.read_text())
        if c.get("result", {}).get("value", 0) > 0:
            return c["result"], c.get("measured_at", "unknown"), str(CACHE_PATH)
    except Exception:
        pass
    def round_no(p):
        m = re.search(r"r(\d+)", p.stem)
        return int(m.group(1)) if m else -1

    # numeric round order: lexicographic sort puts r9 after r10
    for p in sorted(Path(__file__).parent.glob("BENCH_r*.json"),
                    key=round_no, reverse=True):
        try:
            rec = json.loads(p.read_text())
            parsed = rec.get("parsed") or {}
            if parsed.get("value", 0) > 0:
                return parsed, f"driver round {rec.get('n', '?')}", str(p)
        except Exception:
            continue
    return None, None, None


def _save_cache(result: dict) -> None:
    try:
        import subprocess
        commit = subprocess.run(
            ["git", "-C", str(Path(__file__).parent), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    CACHE_PATH.parent.mkdir(parents=True, exist_ok=True)
    CACHE_PATH.write_text(json.dumps({
        "result": result,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": commit,
    }, indent=1) + "\n")


def _parse_result_line(stdout: str):
    """The measurement prints warnings before the JSON line; take the last
    line that parses as the result object."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except Exception:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def main():
    """Orchestrate: probe → measure in a subprocess → cache; retry through
    wedges; on persistent wedge emit the cached last-known-good (stale)."""
    import subprocess

    budget_s = float(os.environ.get("EDSNET_BENCH_BUDGET_S", 1800))
    probe_timeout_s = 90
    probe_retry_sleep_s = 60
    measure_timeout_s = float(
        os.environ.get("EDSNET_BENCH_MEASURE_TIMEOUT_S", 1500))

    deadline = time.monotonic() + budget_s
    failures = []
    while time.monotonic() < deadline:
        if not _device_responsive(probe_timeout_s):
            failures.append("probe-timeout")
            remaining = deadline - time.monotonic()
            if remaining <= probe_retry_sleep_s:
                break
            time.sleep(probe_retry_sleep_s)
            continue
        # device is live: run the measurement in a child so a mid-run
        # wedge cannot hang this process (the driver) forever
        run_timeout = min(measure_timeout_s,
                          max(deadline - time.monotonic(), 60.0) + 120.0)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                capture_output=True, text=True, timeout=run_timeout)
        except subprocess.TimeoutExpired:
            failures.append(f"measure-timeout({int(run_timeout)}s)")
            continue
        result = _parse_result_line(out.stdout)
        if result is not None and result.get("value", 0) > 0:
            try:
                _save_cache(result)
            except Exception:
                pass   # a cache-write failure must never cost the result
            print(json.dumps(result))
            return
        tail = (out.stderr or out.stdout or "").strip().splitlines()
        failures.append("measure-failed: " + "; ".join(tail[-2:])[:200])
        if out.returncode != 0 and _device_responsive(probe_timeout_s):
            # the device is alive but the measurement itself crashes:
            # that's a bench/code regression a stale number must not hide
            print(json.dumps({
                "metric": "frames_scored_per_sec", "value": 0,
                "unit": "frames/s", "vs_baseline": 0,
                "error": "measurement crashed on a responsive device: "
                         + "; ".join(tail[-4:])[:400]}))
            sys.exit(1)
        time.sleep(min(probe_retry_sleep_s,
                       max(deadline - time.monotonic(), 0)))

    # persistent wedge: report the last-known-good measurement, marked
    # stale, instead of a zero — with the wedge evidence alongside
    error = ("accelerator unresponsive/failing for the whole "
             f"{int(budget_s)}s budget: " + " | ".join(failures[-3:]))
    cached, measured_at, source = _load_cache()
    if cached is not None:
        stale = {k: v for k, v in cached.items()
                 if k not in ("stale", "stale_from", "stale_source", "error")}
        stale.update({"stale": True, "stale_from": measured_at,
                      "stale_source": source, "error": error})
        print(json.dumps(stale))
        # CONSUMER CONTRACT: a consumer reading only value/vs_baseline
        # MUST also check "stale" — this emission is a prior measurement,
        # not a fresh one.  Exit code stays 0 by default because the
        # driver records nonzero rc as a failed bench (losing even the
        # stale record); set EDSNET_BENCH_STALE_EXIT_CODE to make stale
        # emissions distinguishable by rc alone.
        rc = int(os.environ.get("EDSNET_BENCH_STALE_EXIT_CODE", "0"))
        if rc:
            sys.exit(rc)
        return
    print(json.dumps({
        "metric": "frames_scored_per_sec", "value": 0,
        "unit": "frames/s", "vs_baseline": 0, "error": error}))
    sys.exit(1)


if __name__ == "__main__":
    if "--measure" in sys.argv[1:]:
        measure()
    else:
        main()
