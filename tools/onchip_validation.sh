#!/bin/bash
# One-shot on-chip validation batch: run the moment the TPU is
# responsive (round-4/5 pending measurements).  Appends everything to
# benchmarks/onchip_r5.log (override with ONCHIP_LOG); safe to re-run.
# tools/tpu_watchdog.sh probes in a loop and invokes this automatically
# the moment the chip answers.
#
#   bash tools/onchip_validation.sh
#
# Captures:
#  1. bench.py headline (also refreshes benchmarks/bench_cache.json)
#  2. train-step batch scaling B in {8,16,32,64} at N=512 (the
#     prefix-sum landmark rework's target: B=64 within ~1.5x of linear)
#  3. flash-attention parity + speed at both kernel precisions
#     (certifies the <=1e-3 'highest' bound the auto-default ships)
#  4. per-stage step breakdown
#  5. compiled-cost roofline (floor_ms vs measured_ms, f32 + bf16)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG="${ONCHIP_LOG:-benchmarks/onchip_r5.log}"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "=== onchip validation $(stamp) commit $(git rev-parse --short HEAD) ===" >> "$LOG"

echo "--- probe ---" >> "$LOG"
if ! timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).sum().block_until_ready(); print('responsive')" >> "$LOG" 2>&1; then
    echo "TPU unresponsive at $(stamp); aborting" >> "$LOG"
    exit 1
fi

fail=0

echo "--- bench.py ---" >> "$LOG"
# stale emissions (bench.py re-printing a cached number through a wedge)
# must count as failure here — the whole point of this batch is FRESH data
EDSNET_BENCH_STALE_EXIT_CODE=3 timeout 2400 python bench.py >> "$LOG" 2>&1 || { echo "bench.py FAILED/wedged/stale (rc $?)" >> "$LOG"; fail=1; }

echo "--- train-step batch scaling (prefix-sum landmarks) ---" >> "$LOG"
for b in 8 16 32 64; do
    timeout 900 python benchmarks/bench_train_step.py --batch $b --seq 512 >> "$LOG" 2>&1 || { echo "bench_train_step B=$b FAILED/wedged (rc $?)" >> "$LOG"; fail=1; }
done

echo "--- train-step bf16 (the production TPU default) ---" >> "$LOG"
for b in 8 64; do
    timeout 900 python benchmarks/bench_train_step.py --batch $b --seq 512 --compute-dtype bfloat16 >> "$LOG" 2>&1 || { echo "bench_train_step bf16 B=$b FAILED/wedged (rc $?)" >> "$LOG"; fail=1; }
done

echo "--- flash parity/speed (default + highest) ---" >> "$LOG"
timeout 900 python benchmarks/bench_flash_parity.py 2048 >> "$LOG" 2>&1 || { echo "bench_flash_parity FAILED/wedged (rc $?)" >> "$LOG"; fail=1; }

echo "--- step breakdown ---" >> "$LOG"
timeout 900 python benchmarks/bench_step_breakdown.py >> "$LOG" 2>&1 || true

echo "--- roofline (compiled cost model vs measured, f32+bf16) ---" >> "$LOG"
timeout 900 python benchmarks/bench_hlo_cost.py --measure >> "$LOG" 2>&1 || true

# exit nonzero when any REQUIRED measurement wedged/failed so the
# watchdog keeps probing instead of declaring DONE on an empty batch
# (breakdown/roofline above stay best-effort)
echo "=== done $(stamp) rc=$fail ===" >> "$LOG"
tail -40 "$LOG"
exit $fail
