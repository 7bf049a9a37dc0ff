#!/bin/bash
# TPU watchdog: cheap probe loop that fires tools/onchip_validation.sh
# the moment the (frequently wedged) axon TPU answers, then exits.
#
#   bash tools/tpu_watchdog.sh &            # or run_in_background
#
# Probes a trivial 64x64 matmul in a 75s-timeout subprocess every
# PROBE_INTERVAL_S (default 180s) so a wedged device can never hang the
# watchdog itself.  Every probe outcome is appended to the log; after
# the validation batch completes a DONE marker is written so the driver
# (and the builder) can tell fresh measurements exist.  Exits 0 after a
# successful batch, 1 if MAX_WAIT_S elapses without a responsive chip.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG="${ONCHIP_LOG:-benchmarks/onchip_r5.log}"
PROBE_INTERVAL_S="${PROBE_INTERVAL_S:-180}"
MAX_WAIT_S="${MAX_WAIT_S:-36000}"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

mkdir -p benchmarks
echo "=== tpu_watchdog start $(stamp) (interval ${PROBE_INTERVAL_S}s, max ${MAX_WAIT_S}s) ===" >> "$LOG"
start=$(date +%s)
attempt=0
while true; do
    attempt=$((attempt + 1))
    if timeout 75 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).sum().block_until_ready(); print('responsive')" > /dev/null 2>&1; then
        echo "watchdog: probe #$attempt responsive at $(stamp); launching validation batch" >> "$LOG"
        ONCHIP_LOG="$LOG" bash tools/onchip_validation.sh > /dev/null 2>&1
        rc=$?
        echo "watchdog: validation batch rc=$rc at $(stamp)" >> "$LOG"
        if [ "$rc" -eq 0 ]; then
            echo "=== tpu_watchdog DONE $(stamp) ===" >> "$LOG"
            exit 0
        fi
        # batch itself hit a wedge mid-run; keep probing
    else
        echo "watchdog: probe #$attempt wedged at $(stamp)" >> "$LOG"
    fi
    now=$(date +%s)
    if [ $((now - start)) -ge "$MAX_WAIT_S" ]; then
        echo "=== tpu_watchdog GAVE UP after ${MAX_WAIT_S}s $(stamp) ===" >> "$LOG"
        exit 1
    fi
    sleep "$PROBE_INTERVAL_S"
done
