"""Knapsack tie fuzz: DP vs the C++ branch&bound on adversarial instances.

The reference selects shots with ortools' B&B solver
(`src/helpers/vsumm_helper.py:26-45`), which is absent from this image; our
host path is an exact dense DP and the parity suite's ortools stub is
backed by that same DP.  This fuzz bounds the one remaining question: on
instances with equal-value / equal-density ties, do two *different* exact
solvers (our DP with its backtracking order vs our independent C++
Horowitz–Sahni B&B) agree on the optimal VALUE always, and how often do
their selection SETS diverge?  The measured divergence is documented in
DESIGN.md — any true-ortools disagreement is bounded by the same tie class.
"""
import numpy as np
import pytest

from edsnet_tpu.native import load as native_load
from edsnet_tpu.ops.knapsack import _knapsack_numpy, knapsack_jax


def _instances(rng, n_instances):
    """Mix of random and adversarial tie-heavy knapsack instances."""
    for i in range(n_instances):
        kind = i % 4
        n = rng.randint(1, 40)
        if kind == 0:          # generic random
            values = rng.randint(0, 1000, n)
            weights = rng.randint(1, 60, n)
        elif kind == 1:        # equal-density ties: value == weight * k
            k = rng.randint(1, 5)
            weights = rng.randint(1, 30, n)
            values = weights * k
        elif kind == 2:        # equal-value ties, few distinct values
            values = rng.choice([10, 20, 40], n)
            weights = rng.choice([3, 5, 7, 9], n)
        else:                  # shot-score-like: near-identical densities
            weights = rng.randint(20, 40, n)
            values = weights * 15 + rng.randint(-2, 3, n)
        capacity = int(rng.randint(0, max(int(weights.sum()), 1) + 5))
        yield values.astype(np.int64), weights.astype(np.int64), capacity


def test_dp_vs_native_bnb_value_always_equal():
    lib = native_load()
    if lib is None:
        pytest.skip("native extension unavailable")
    rng = np.random.RandomState(0)
    n_total, n_set_diverged = 0, 0
    for values, weights, capacity in _instances(rng, 10_000):
        dp_sel = _knapsack_numpy(values, weights, capacity)
        bb_sel = lib.knapsack(values, weights, capacity)
        dp_val = int(values[dp_sel].sum())
        bb_val = int(values[bb_sel].sum())
        assert dp_val == bb_val, (values, weights, capacity, dp_sel, bb_sel)
        assert int(weights[dp_sel].sum()) <= capacity
        assert int(weights[bb_sel].sum()) <= capacity
        n_total += 1
        if list(dp_sel) != list(bb_sel):
            n_set_diverged += 1
    # ties exist by construction, so SOME set divergence is expected;
    # record the measured rate (documented in DESIGN.md).  The assert pins
    # the band so a solver regression that explodes divergence is caught.
    rate = n_set_diverged / n_total
    assert rate < 0.35, f"selection-set divergence rate {rate:.3f}"


def test_dp_vs_jax_dp_selection():
    """The jittable device DP must match the host DP exactly (value and,
    because both backtrack items in the same reverse order, selection)."""
    rng = np.random.RandomState(1)
    for values, weights, capacity in _instances(rng, 120):
        host = _knapsack_numpy(values, weights, capacity)
        mask = np.asarray(knapsack_jax(
            values.astype(np.int32), weights.astype(np.int32),
            np.int32(capacity), max_capacity=int(max(capacity, 1))))
        dev = [int(i) for i in np.nonzero(mask)[0]]
        assert dev == list(host), (values, weights, capacity, host, dev)
