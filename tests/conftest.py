"""Test config: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's CI strategy (CPU-only torch, mock datasets,
`.github/workflows/unit-test.yml`) for testing without a TPU pod.
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may preset axon/tpu
# single-core box: persist XLA compilations across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_test"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
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
