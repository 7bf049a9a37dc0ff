"""Runtime setup: persistent XLA compilation cache + device selection.

First compiles dominate wall-clock on small hosts (and TPU compiles are
20-40s); every CLI entry point calls ``setup_runtime`` so recompiles are
served from a persistent on-disk cache across processes.
"""
from __future__ import annotations

import os
from pathlib import Path


def setup_runtime(device: str = "auto", cache_dir: str | None = None,
                  matmul_precision: str | None = None) -> None:
    """Configure jax before heavy use. Safe to call multiple times."""
    if device and device != "auto" and "JAX_PLATFORMS" not in os.environ:
        os.environ["JAX_PLATFORMS"] = device

    import jax

    # On platforms whose jax plugin force-registers itself (the tunneled
    # axon TPU ignores the JAX_PLATFORMS env var entirely), the config key
    # is the only reliable override — honor an explicit --device request.
    if device and device != "auto":
        try:
            jax.config.update("jax_platforms",
                              "cpu" if device == "cpu" else device)
        except Exception:
            pass  # backend already initialized; env var had to win

    # Multi-host: when launched under a multi-process TPU runtime (GKE /
    # tpu-vm with the standard coordinator env), join the cluster so
    # jax.devices() spans all hosts and the data mesh shards globally.
    # Single-host runs (this box) have none of these variables set.
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if coord and not getattr(setup_runtime, "_distributed", False):
        try:
            kwargs = {}
            # explicit process topology (manual CPU/GPU clusters); TPU pods
            # auto-detect all three when the env vars are absent
            if os.environ.get("JAX_NUM_PROCESSES"):
                kwargs = dict(
                    coordinator_address=coord,
                    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                    process_id=int(os.environ["JAX_PROCESS_ID"]))
            jax.distributed.initialize(**kwargs)
            setup_runtime._distributed = True
        except Exception as e:  # never block single-host work
            import logging
            logging.getLogger().warning(
                f"jax.distributed.initialize failed: {e}; continuing "
                f"single-process")

    def _set(name: str, value) -> None:
        # only update on a real change: every jax.config.update invalidates
        # the in-process jit caches, forcing re-lowering and repeated
        # persistent-cache deserializations — and XLA:CPU's AOT
        # deserialization segfaults after enough repeats (jax 0.9.0;
        # observed as a deterministic full-test-suite crash)
        try:
            if getattr(jax.config, name) != value:
                jax.config.update(name, value)
        except Exception:
            pass  # older jax without the option

    if matmul_precision:
        _set("jax_default_matmul_precision", matmul_precision)

    cache = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "edsnet_tpu_xla"))
    # segregate by backend: the tunneled TPU platform writes XLA:CPU AOT
    # helper executables compiled for a DIFFERENT machine into the cache;
    # a later pure-CPU process loading them SIGILLs (observed: full test
    # suite segfault after TPU benchmarks shared the cache dir)
    try:
        cache = str(Path(cache) / jax.default_backend())
    except Exception:
        pass
    Path(cache).mkdir(parents=True, exist_ok=True)
    # keep jax's DEFAULT persistent-cache thresholds: caching every tiny
    # executable multiplied deserializations and triggered the XLA:CPU
    # AOT segfault above
    _set("jax_compilation_cache_dir", cache)


def resolve_compute_dtype(requested: str | None) -> str:
    """Resolve the --compute-dtype 'auto' default.

    bfloat16 mixed precision (f32 master params / losses / optimizer) is
    a repeatable ~12% train-step win on the HBM-bound step with converged
    F-scores measured EQUAL to f32's on-chip (benchmarks/RESULTS.md,
    round-3 traffic-levers study; gated in CI by the bf16 arm of
    tests/parity/test_e2e_training.py) — so 'auto' picks it on real TPU
    backends.  CPU keeps float32: the cross-framework parity suite runs
    there and the reference trains in f32.
    """
    if requested in (None, "auto"):
        import jax
        return "bfloat16" if jax.default_backend() == "tpu" else "float32"
    return requested
