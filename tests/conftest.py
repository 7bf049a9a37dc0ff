"""Test config: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's CI strategy (CPU-only torch, mock datasets,
`.github/workflows/unit-test.yml`) for testing without a TPU pod.
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may preset axon/tpu
# single-core box: persist XLA compilations across test runs.
# NOTE: keep jax's DEFAULT cache thresholds (min_compile_time_secs=1).
# Caching every tiny executable (min_compile_time 0 / min_entry_size -1)
# multiplies executable loads; every loaded XLA:CPU executable holds
# memory mappings and the full suite runs into the kernel's
# vm.max_map_count limit (default 65530), which XLA surfaces as a
# segfault inside backend.deserialize_executable after ~200 tests.
# See the map-count guard at the bottom of this file.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_test"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Belt and braces: if some plugin already imported jax (reading the shell's
# JAX_PLATFORMS), override the config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge._backends, (
    "a jax backend initialized before conftest could force the CPU platform")


# ---------------------------------------------------------------------------
# Memory-mapping guard.
#
# Every live XLA:CPU executable holds several memory mappings; a full-suite
# run accumulates tens of thousands and crosses vm.max_map_count (default
# 65530), at which point the next executable load SEGFAULTS (observed
# deterministically at ~62.7k maps inside compilation_cache deserialization,
# jax 0.9.0).  Two defenses:
#   1. best-effort raise of the sysctl (works in the root container);
#   2. jax.clear_caches() whenever the process's map count nears the limit
#      — measured to actually release executable mappings (598 -> 464 in a
#      40-compile probe).  Costs recompiles for later tests; fires rarely.
# ---------------------------------------------------------------------------
import subprocess  # noqa: E402


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


def pytest_sessionstart(session):
    # EDSNET_TEST_NO_SYSCTL_RAISE exists to exercise the non-root fallback.
    if (_map_limit() < 262144
            and not os.environ.get("EDSNET_TEST_NO_SYSCTL_RAISE")):
        subprocess.run(
            ["sysctl", "-w", "vm.max_map_count=1048576"],
            capture_output=True, check=False)


def pytest_runtest_teardown(item, nextitem):
    # Leave ample headroom: one test can add a few thousand mappings.
    if _map_count() > int(_map_limit() * 0.6):
        import gc
        n = _map_count()
        jax.clear_caches()
        gc.collect()
        print(f"\n[conftest] map-count guard: {n} -> {_map_count()} "
              f"mappings (limit {_map_limit()}); cleared jax caches")
