"""knapsack + summary spec — from reference tests/helpers/test_vsumm_helper.py."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.ops import knapsack as ks
from edsnet_tpu.ops import summary as vs

VALUES_1 = [92, 57, 49, 68, 60, 43, 67, 84, 87, 72]
WEIGHTS_1 = [23, 31, 29, 44, 53, 38, 63, 85, 89, 82]
ANSWER_1 = np.array([1, 1, 1, 1, 0, 1, 0, 0, 0, 0])

VALUES_2 = [825594, 1677009, 1676628, 1523970, 943972, 97426, 69666, 1296457,
            1679693, 1902996, 1844992, 1049289, 1252836, 1319836, 953277,
            2067538, 675367, 853655, 1826027, 65731, 901489, 577243, 466257,
            369261]
WEIGHTS_2 = [382745, 799601, 909247, 729069, 467902, 44328, 34610, 698150,
             823460, 903959, 853665, 551830, 610856, 670702, 488960, 951111,
             323046, 446298, 931161, 31385, 496951, 264724, 224916, 169684]
ANSWER_2 = np.array([1, 1, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 0, 0,
                     0, 0, 1, 1, 1])


def test_knapsack_published_instances():
    out = np.array(ks.knapsack(VALUES_1, WEIGHTS_1, 165))
    answer, = np.where(ANSWER_1 > 0.5)
    assert (out == answer).all()

    out = np.array(ks.knapsack(VALUES_2, WEIGHTS_2, 6404180))
    answer, = np.where(ANSWER_2 > 0.5)
    assert (out == answer).all()


def test_knapsack_numpy_fallback_matches():
    out = ks._knapsack_numpy(np.array(VALUES_1), np.array(WEIGHTS_1), 165)
    answer, = np.where(ANSWER_1 > 0.5)
    assert (np.array(out) == answer).all()


def test_knapsack_jax_matches_host():
    rng = np.random.RandomState(7)
    n, max_cap = 24, 1200  # fixed shapes: one trace
    for _ in range(5):
        values = rng.randint(0, 1000, n)
        weights = rng.randint(1, 80, n)
        cap = int(rng.randint(1, min(int(weights.sum()), max_cap) + 1))
        host = ks.knapsack(values, weights, cap)
        sel = np.asarray(ks.knapsack_jax(values, weights, cap,
                                         max_capacity=max_cap))
        # optima must agree in value (solutions may differ on ties)
        assert values[sel].sum() == values[host].sum()
        assert weights[sel].sum() <= cap


def test_knapsack_jax_published_instance():
    sel = np.asarray(ks.knapsack_jax(VALUES_1, WEIGHTS_1, 165,
                                     max_capacity=200))
    assert (np.where(sel)[0] == np.where(ANSWER_1 > 0.5)[0]).all()


def test_f1_score():
    pred = np.array([0, 1, 1, 0, 1], dtype=bool)
    test = np.array([1, 1, 0, 1, 1], dtype=bool)
    assert math.isclose(vs.f1_score(pred, test), 4 / 7)
    assert math.isclose(float(vs.f1_score_jax(pred, test)), 4 / 7,
                        rel_tol=1e-6)
    assert vs.f1_score(np.zeros(5, bool), test) == 0.0


def _toy_video():
    n_frames = 90
    picks = np.arange(0, 90, 15, dtype=np.int32)  # 6 picks
    cps = np.array([[0, 29], [30, 59], [60, 89]], dtype=np.int32)
    nfps = np.array([30, 30, 30], dtype=np.int32)
    pred = np.array([0.1, 0.9, 0.9, 0.8, 0.05, 0.3], dtype=np.float32)
    return pred, cps, n_frames, nfps, picks


def test_get_keyshot_summ():
    pred, cps, n_frames, nfps, picks = _toy_video()
    summ = vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks)
    assert summ.shape == (n_frames,)
    assert summ.dtype == bool
    # budget: 15% of 90 = 13 frames; every shot is 30 frames -> nothing fits
    assert summ.sum() == 0

    summ = vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks,
                               proportion=0.5)
    # capacity 45 fits exactly one shot; shot 1 (mean .85) beats shot 0/2
    assert summ[30:60].all() and summ.sum() == 30


def test_keyshot_summ_jax_matches_host():
    pred, cps, n_frames, nfps, picks = _toy_video()
    for prop in (0.15, 0.4, 0.5, 0.8):
        host = vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks,
                                   proportion=prop)
        dev = np.asarray(vs.keyshot_summ_jax(
            pred, picks, cps, nfps, np.ones(3, bool), n_frames,
            max_frames=96, proportion=prop))[:n_frames]
        assert (host == dev).all(), prop


def test_keyshot_summ_jax_nonzero_start_picks():
    """Frames before the first pick score 0, matching the host upsample
    (vsumm_helper.py:75-78 writes only [picks[i], picks[i+1]) ranges into
    a zeros array).  Regression: the searchsorted path clipped index -1
    to 0 and leaked pred[0] into frames 0..picks[0]-1, silently shifting
    segment means and the knapsack packing."""
    rng = np.random.RandomState(0)
    n_frames = 90
    picks = np.arange(10, n_frames, 15, dtype=np.int32)  # first pick at 10
    pred = rng.rand(len(picks)).astype(np.float32)
    pred[0] = 1.0   # maximally incriminating leak value
    bounds = np.linspace(0, n_frames, 10, dtype=np.int32)
    cps = np.stack([bounds[:-1], bounds[1:] - 1], 1)
    nfps = (bounds[1:] - bounds[:-1]).astype(np.int32)
    for prop in (0.2, 0.5):
        host = vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks,
                                   proportion=prop)
        dev = np.asarray(vs.keyshot_summ_jax(
            pred, picks, cps, nfps, np.ones(len(cps), bool), n_frames,
            max_frames=96, proportion=prop))[:n_frames]
        assert (host == dev).all(), prop


def test_keyshot_summ_jax_long_video_quantization():
    """int(1000*mean) parity on a LONG video.  Regression: segment means
    came from a single global prefix sum whose f32 magnitude (~1e4 at
    20k frames) carries cancellation error around the quantization
    boundary; per-segment sums keep the error at segment scale."""
    rng = np.random.RandomState(1)
    n_frames, rate = 20000, 15
    n = -(-n_frames // rate)
    picks = (np.arange(n) * rate).astype(np.int32)
    pred = rng.rand(n).astype(np.float32)
    bounds = np.linspace(0, n_frames, 41, dtype=np.int32)
    cps = np.stack([bounds[:-1], bounds[1:] - 1], 1)
    nfps = (bounds[1:] - bounds[:-1]).astype(np.int32)
    host = vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks)
    dev = np.asarray(vs.keyshot_summ_jax(
        pred, picks, cps, nfps, np.ones(len(cps), bool), n_frames,
        max_frames=20480))[:n_frames]
    assert (host == dev).all()


def test_keyshot_summ_nan_raises():
    pred, cps, n_frames, nfps, picks = _toy_video()
    pred = pred.copy()
    pred[0] = np.nan
    with pytest.raises(ValueError):
        vs.get_keyshot_summ(pred, cps, n_frames, nfps, picks)


def test_bbox2summary():
    pred, cps, n_frames, nfps, picks = _toy_video()
    boxes = np.array([[1, 3], [2, 5]], dtype=np.int32)
    cls = np.array([0.9, 0.5], dtype=np.float32)
    summ = vs.bbox2summary(6, cls, boxes, cps, n_frames, nfps, picks)
    assert summ.shape == (n_frames,)

    raster = np.asarray(vs.rasterize_boxes_jax(6, cls, boxes,
                                               np.ones(2, bool)))
    assert np.allclose(raster, [0, 0.9, 0.9, 0.5, 0.5, 0])


def test_get_summ_f1score_pad_trim_and_metric():
    test_summ = np.array([[1, 1, 0, 0], [0, 0, 1, 1]], dtype=bool)
    pred = np.array([1, 1, 0, 0, 1], dtype=bool)  # longer -> trimmed
    avg = vs.get_summ_f1score(pred, test_summ, "avg")
    mx = vs.get_summ_f1score(pred, test_summ, "max")
    assert math.isclose(mx, 1.0)
    assert math.isclose(avg, 0.5)
    short = np.array([1, 1], dtype=bool)  # shorter -> padded
    assert math.isclose(vs.get_summ_f1score(short, test_summ, "max"), 1.0)
    with pytest.raises(ValueError):
        vs.get_summ_f1score(pred, test_summ, "nope")


def test_diversity():
    feats = np.eye(4, dtype=np.float32)
    summ = np.array([1, 1, 0, 0], dtype=bool)
    assert vs.get_summ_diversity(summ, feats) == 0.0  # orthogonal
    summ1 = np.array([1, 0, 0, 0], dtype=bool)
    assert vs.get_summ_diversity(summ1, feats) == 0.0  # fewer than 2
    feats2 = np.ones((3, 2), dtype=np.float32)
    summ2 = np.ones(3, dtype=bool)
    assert math.isclose(vs.get_summ_diversity(summ2, feats2), 2.0)


def test_knapsack_many_similar_items_fast():
    """~400 similar-density items (real per-shot scores) must solve fast —
    branch & bound degenerates exponentially here; the DP path must kick in."""
    import time
    rng = np.random.RandomState(0)
    n = 400
    values = rng.randint(400, 600, n)
    weights = rng.randint(20, 40, n)
    cap = 1500
    t0 = time.perf_counter()
    packed = ks.knapsack(values, weights, cap)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"knapsack took {dt:.1f}s"
    assert weights[packed].sum() <= cap
    # optimality cross-check against the pure DP
    dp = ks._knapsack_numpy(np.asarray(values, np.int64),
                            np.asarray(weights, np.int64), cap)
    assert values[packed].sum() == values[dp].sum()
