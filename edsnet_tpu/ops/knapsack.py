"""Exact 0/1 knapsack.

The reference delegates to ortools' C++ branch-and-bound solver
(`src/helpers/vsumm_helper.py:26-45`).  Here:

- ``knapsack``          host API: native C++ branch&bound if the extension is
                        built, else a vectorized NumPy DP.  Exact either way
                        (values/weights are ints, so DP == B&B optimum).
- ``knapsack_jax``      jittable dense DP (lax.scan over items, capacity axis
                        vectorized) for running shot selection on-device
                        inside a jitted eval/train step.

Both return the packed item indices (ascending), like the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.native import load as _native_load


def _knapsack_numpy(values: np.ndarray, weights: np.ndarray,
                    capacity: int) -> List[int]:
    """Dense DP with backtracking. O(n * capacity) time, O(n*capacity) bits."""
    n = len(values)
    if n == 0 or capacity <= 0:
        return []
    cap = int(capacity)
    # clamp weights>cap items out up-front to shrink nothing; DP handles them.
    dp = np.zeros(cap + 1, dtype=np.int64)
    take = np.zeros((n, cap + 1), dtype=bool)
    for i in range(n):
        w, v = int(weights[i]), int(values[i])
        if w <= cap and v > 0:
            cand = dp[: cap + 1 - w] + v
            better = cand > dp[w:]
            take[i, w:] = better
            dp[w:] = np.where(better, cand, dp[w:])
    # backtrack
    packed: List[int] = []
    c = cap
    for i in range(n - 1, -1, -1):
        if take[i, c]:
            packed.append(i)
            c -= int(weights[i])
    packed.reverse()
    return packed


def knapsack(values: Iterable[int], weights: Iterable[int],
             capacity: int, solver: str = "auto") -> List[int]:
    """Solve 0/1 knapsack exactly; returns packed item indices.

    Host-side replacement for vsumm_helper.py:26-45 (ortools B&B).

    Strategy (``solver="auto"``): dense DP when the table is small
    (O(n * capacity), exact and *predictable* — branch & bound degenerates
    exponentially on many similar-density items, which is exactly what
    per-shot video scores look like); the C++ B&B handles the huge-capacity
    regime where a DP table would not fit.

    ``solver="dp"`` / ``solver="bnb"`` force one implementation — both are
    exact, but on *tied* optima they can pick different item sets (the
    reference's ortools B&B has its own tie order).  The eval-time knapsack
    audit uses the forced modes to measure that divergence on real videos.
    ``"bnb"`` raises RuntimeError when the native extension is unavailable.
    """
    values = np.asarray(list(values), dtype=np.int64)
    weights = np.asarray(list(weights), dtype=np.int64)
    capacity = int(capacity)
    if solver == "dp":
        return _knapsack_numpy(values, weights, capacity)
    if solver == "bnb":
        lib = _native_load()
        if lib is None:
            raise RuntimeError("native C++ knapsack unavailable")
        return lib.knapsack(values, weights, capacity)
    if solver != "auto":
        raise ValueError(f"unknown knapsack solver {solver!r}")
    if values.size * max(capacity, 1) <= 50_000_000:
        return _knapsack_numpy(values, weights, capacity)
    lib = _native_load()
    if lib is not None:
        return lib.knapsack(values, weights, capacity)
    return _knapsack_numpy(values, weights, capacity)


@partial(jax.jit, static_argnames=("max_capacity",))
def knapsack_jax(values, weights, capacity, max_capacity: int):
    """Jittable exact 0/1 knapsack via dense DP.

    :param values: [N] int32 item values (padding items must have value 0).
    :param weights: [N] int32 item weights (>=0; weight-0/value-0 padding ok).
    :param capacity: scalar int32 runtime capacity (<= max_capacity).
    :param max_capacity: static DP-table width.
    :return: packed [N] bool mask of selected items.
    """
    values = jnp.asarray(values, jnp.int32)
    weights = jnp.asarray(weights, jnp.int32)
    capacity = jnp.asarray(capacity, jnp.int32)
    n = values.shape[0]
    cap_axis = jnp.arange(max_capacity + 1, dtype=jnp.int32)

    neg_big = jnp.int32(-(10 ** 9))

    def fwd(dp, iw):
        v, w = iw
        # dp'[c] = max(dp[c], dp[c-w] + v) for c >= w.  The shift by the
        # traced weight is a contiguous dynamic_slice of a front-padded
        # copy — 2x faster on TPU than the equivalent elementwise gather
        # (gathers serialize; slices are block copies).
        padded = jnp.concatenate(
            [jnp.full((max_capacity,), neg_big, jnp.int32), dp])
        shifted = jax.lax.dynamic_slice(
            padded, (max_capacity - w,), (max_capacity + 1,)) + v
        usable = (w <= capacity) & (v > 0)
        cand = jnp.where(usable, shifted, jnp.int32(-1))
        took = cand > dp
        return jnp.where(took, cand, dp), took

    dp0 = jnp.where(cap_axis <= capacity, 0, -(10 ** 9)).astype(jnp.int32)
    # capacities above the runtime capacity are poisoned so backtracking from
    # `capacity` never routes through them.
    dp_final, takes = jax.lax.scan(fwd, dp0, (values, weights))

    def bwd(c, i):
        # iterate items in reverse
        j = n - 1 - i
        t = takes[j, c]
        sel = t
        c = jnp.where(t, jnp.maximum(c - weights[j], 0), c)
        return c, sel

    _, sel_rev = jax.lax.scan(bwd, capacity, jnp.arange(n))
    return jnp.flip(sel_rev)
