#!/bin/bash
# Test gate — the moral equivalent of the reference's GitHub Actions
# workflow (.github/workflows/unit-test.yml) for this environment.
# Runs the full suite on the virtual 8-device CPU mesh, then the driver
# entry points (single-chip compile check + multi-chip dryrun).
#
#   bash tools/ci.sh            # full gate
#   bash tools/ci.sh --fast     # skip the slower parity + learning suites
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_test}"
# keep jax's DEFAULT cache thresholds: caching every tiny executable
# (min_compile_time 0) triggers an XLA:CPU AOT deserialization segfault
# after hundreds of entries (see tests/conftest.py)

# every live XLA:CPU executable holds memory mappings; the full suite can
# cross the kernel's default vm.max_map_count=65530, which XLA surfaces
# as a segfault. Raise it when permitted (conftest also guards in-process).
if [[ "$(cat /proc/sys/vm/max_map_count 2>/dev/null || echo 0)" -lt 262144 ]]; then
    sysctl -w vm.max_map_count=1048576 2>/dev/null || true
fi

PYTEST_ARGS=(tests/ -q)
if [[ "${1:-}" == "--fast" ]]; then
    PYTEST_ARGS+=(--ignore=tests/parity --ignore=tests/test_learning.py)
fi

echo "== pytest =="
python -m pytest "${PYTEST_ARGS[@]}"

echo "== driver entry (single-chip compile) + multi-chip dryrun =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'PY'
# this box's sitecustomize force-selects the axon TPU platform; claim the
# virtual 8-device CPU platform before any backend initializes (same
# strategy as tests/conftest.py)
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from __graft_entry__ import entry, dryrun_multichip
fn, args = entry()
out = jax.jit(fn)(*args)
print("entry ok:", jax.tree.map(lambda t: t.shape, out))
dryrun_multichip(8)
PY

echo "CI gate passed."
