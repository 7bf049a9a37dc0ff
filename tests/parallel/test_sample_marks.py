"""Negative/incomplete sampling: radix-count selection == argsort ranks.

`_sample_marks` marks the `num` smallest uniform draws among eligible
entries.  Round 3 replaced the full argsort (slow bitonic networks on
TPU) with a 32-pass radix binary search; this pins the selected SET to
the original stable-argsort formulation bit-exactly, including threshold
ties and the num>=eligible / num=0 edges.
"""
import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.parallel.steps import (
    _sample_marks, _sample_marks_argsort_reference as _sample_marks_argsort)


def test_matches_argsort_formulation():
    rng = np.random.RandomState(0)
    # few distinct n values: every distinct shape costs a jit compile
    for trial, n in enumerate([1, 2, 7, 64, 64, 64, 300, 300, 300, 300]):
        eligible = jnp.asarray(rng.rand(n) < rng.uniform(0.05, 0.95))
        n_eligible = int(eligible.sum())
        for num in {0, 1, n_eligible // 2, n_eligible, n_eligible + 5,
                    n}:
            key = jax.random.PRNGKey(trial * 100 + num)
            got = np.asarray(_sample_marks(eligible, jnp.int32(num), key))
            want = np.asarray(
                _sample_marks_argsort(eligible, jnp.int32(num), key))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"n={n} num={num}")
            assert got.sum() == min(num, n_eligible)
            assert not np.any(got & ~np.asarray(eligible))


def test_threshold_ties_break_by_index():
    """Force exact bit-pattern ties at the selection threshold."""
    eligible = jnp.ones(8, bool)

    def fake_uniform(rng, shape):
        return jnp.asarray([0.5, 0.25, 0.5, 0.125, 0.5, 0.5, 0.9, 0.5])

    real = jax.random.uniform
    jax.random.uniform = fake_uniform
    try:
        got = np.asarray(_sample_marks(eligible, jnp.int32(4),
                                       jax.random.PRNGKey(0)))
    finally:
        jax.random.uniform = real
    # two below threshold (0.125, 0.25) + the first two 0.5 ties by index
    np.testing.assert_array_equal(
        got, [True, True, True, True, False, False, False, False])
