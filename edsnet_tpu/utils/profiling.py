"""Profiling / tracing hooks.

The reference's entire observability is coarse epoch wall-clock prints
(`src/anchor_based/train.py:158-161`).  Here: a ``--profile`` flag wires
jax.profiler traces plus a frames-scored/sec counter (the north-star
metric) around the training loop.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, List, Optional


@dataclass
class StepTimer:
    """block_until_ready-accurate step timing + frames/sec accounting."""
    frames: int = 0
    seconds: float = 0.0
    steps: int = 0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, frames: int, sync=None):
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        self.seconds += time.perf_counter() - self._t0
        self.frames += frames
        self.steps += 1

    @property
    def frames_per_sec(self) -> float:
        return self.frames / self.seconds if self.seconds else 0.0

    def summary(self) -> Dict[str, float]:
        return {"frames": self.frames, "seconds": round(self.seconds, 4),
                "steps": self.steps,
                "frames_per_sec": round(self.frames_per_sec, 2)}


@contextlib.contextmanager
def maybe_trace(enabled: bool, log_dir: str):
    """jax.profiler trace context when profiling is on."""
    if not enabled:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class NaNGuard:
    """Mirror of the reference's NaN-skip accounting
    (anchor_based/train.py:78-84) plus optional jax_debug_nans."""

    def __init__(self, debug_nans: bool = False):
        self.skipped: List[str] = []
        if debug_nans:
            import jax
            jax.config.update("jax_debug_nans", True)

    def record_skip(self, key: str):
        self.skipped.append(key)
