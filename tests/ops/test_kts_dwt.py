"""KTS + DWT spec: DP vs direct reference transcription; haar vs known values."""
import numpy as np

from edsnet_tpu.ops import dwt, kts


def _reference_cpd_nonlin(K, ncp, lmin=1, lmax=100000, backtrack=True):
    """Direct transcription of reference src/kts/cpd_nonlin.py (spec oracle)."""
    m = int(ncp)
    n, _ = K.shape
    J = kts.calc_scatters(K)
    I = 1e101 * np.ones((m + 1, n + 1))
    I[0, lmin:lmax] = J[0, lmin - 1:lmax - 1]
    p = np.zeros((m + 1, n + 1), dtype=int)
    for k in range(1, m + 1):
        for l in range((k + 1) * lmin, n + 1):
            tmin = max(k * lmin, l - lmax)
            tmax = l - lmin + 1
            c = J[tmin:tmax, l - 1].reshape(-1) + \
                I[k - 1, tmin:tmax].reshape(-1)
            I[k, l] = np.min(c)
            if backtrack:
                p[k, l] = np.argmin(c) + tmin
    cps = np.zeros(m, dtype=int)
    if backtrack:
        cur = n
        for k in range(m, 0, -1):
            cps[k - 1] = p[k, cur]
            cur = cps[k - 1]
    scores = I[:, n].copy()
    scores[scores > 1e99] = np.inf
    return cps, scores


def _synthetic_kernel(seed=0, n=60, segs=3):
    rng = np.random.RandomState(seed)
    means = rng.randn(segs, 8) * 3
    X = np.concatenate([means[i] + 0.1 * rng.randn(n // segs, 8)
                        for i in range(segs)])
    return X @ X.T


def test_calc_scatters_matches_reference_formula():
    K = _synthetic_kernel()
    J = kts.calc_scatters(K)
    n = K.shape[0]
    # brute-force scatter of [i..j]: sum_d K[d,d] - sum_{d,e} K[d,e]/(j-i+1)
    for i in [0, 5, 20]:
        for j in [i, i + 3, n - 1]:
            block = K[i:j + 1, i:j + 1]
            expect = np.trace(block) - block.sum() / (j - i + 1)
            assert np.isclose(J[i, j], expect, atol=1e-6)


def test_cpd_nonlin_matches_reference():
    K = _synthetic_kernel()
    for ncp in (2, 5):
        ref_cps, ref_scores = _reference_cpd_nonlin(K, ncp)
        cps, scores = kts.cpd_nonlin(K, ncp, verbose=False)
        assert (cps == ref_cps).all()
        finite = np.isfinite(ref_scores)
        assert (np.isfinite(scores) == finite).all()
        assert np.allclose(scores[finite], ref_scores[finite], rtol=1e-9)


def test_cpd_nonlin_with_lmin_lmax():
    K = _synthetic_kernel(seed=3)
    ref_cps, ref_scores = _reference_cpd_nonlin(K, 4, lmin=5, lmax=30)
    cps, scores = kts.cpd_nonlin(K, 4, lmin=5, lmax=30, verbose=False)
    assert (cps == ref_cps).all()
    finite = np.isfinite(ref_scores)
    assert np.allclose(scores[finite], ref_scores[finite], rtol=1e-9)


def test_cpd_auto_matches_two_pass_reference():
    K = _synthetic_kernel(seed=1)

    def reference_cpd_auto(K, ncp, vmax, desc_rate=1):
        m = ncp
        _, scores = _reference_cpd_nonlin(K, m, backtrack=False)
        N = K.shape[0]
        N2 = N * desc_rate
        penalties = np.zeros(m + 1)
        ncps = np.arange(1, m + 1)
        penalties[1:] = (vmax * ncps / (2.0 * N2)) * \
            (np.log(float(N2) / ncps) + 1)
        costs = scores / float(N) + penalties
        m_best = np.argmin(costs)
        return _reference_cpd_nonlin(K, m_best)

    ref_cps, ref_scores = reference_cpd_auto(K, K.shape[0] - 1, 1)
    cps, scores = kts.cpd_auto(K, K.shape[0] - 1, 1)
    assert (cps == ref_cps).all()
    assert np.allclose(scores, ref_scores, rtol=1e-9)
    # detected change points should be near the true boundaries (20, 40)
    assert len(cps) >= 2


def test_kts_dp_jax_matches_host():
    K = _synthetic_kernel(seed=2, n=40)
    m_max = 8
    J = kts.calc_scatters(K)
    scores_j, path_j = kts.kts_dp_jax(J.astype(np.float32), m_max)
    _, scores_ref = _reference_cpd_nonlin(K, m_max, backtrack=False)
    sj = np.asarray(scores_j, dtype=np.float64)
    finite = np.isfinite(scores_ref)
    assert np.allclose(sj[finite], scores_ref[finite], rtol=1e-3)
    # backtrack at a fixed m matches host
    for m_best in (2, 5):
        ref_cps, _ = _reference_cpd_nonlin(K, m_best)
        cps, valid = kts.kts_backtrack_jax(path_j, m_best, m_max, K.shape[0])
        cps = np.asarray(cps)[np.asarray(valid)]
        assert (cps == ref_cps).all()


def test_haar_dwt_known_values():
    # pywt.dwt([1,2],'haar') -> cA=[2.1213], cD=[-0.7071]
    ca, cd = dwt.haar_dwt(np.array([[1.0, 2.0]]).T[None].transpose(0, 1, 2))
    x = np.array([1.0, 2.0, 3.0, 5.0])[None, :, None]
    ca, cd = dwt.haar_dwt(x, axis=1)
    assert np.allclose(np.asarray(ca)[0, :, 0],
                       [3 / np.sqrt(2), 8 / np.sqrt(2)])
    assert np.allclose(np.asarray(cd)[0, :, 0],
                       [-1 / np.sqrt(2), -2 / np.sqrt(2)])


def test_haar_dwt_odd_length_symmetric():
    x = np.array([1.0, 2.0, 7.0])[None, :, None]
    ca, cd = dwt.haar_dwt(x, axis=1)
    assert np.allclose(np.asarray(ca)[0, :, 0],
                       [3 / np.sqrt(2), 14 / np.sqrt(2)])
    assert np.allclose(np.asarray(cd)[0, :, 0], [-1 / np.sqrt(2), 0.0])


def test_haar_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 4).astype(np.float32)
    ca, cd = dwt.haar_dwt(x, axis=1)
    back = dwt.haar_idwt(ca, cd, axis=1)
    assert np.allclose(np.asarray(back), x, atol=1e-6)


def test_cpd_auto_device_matches_host_real_sizes():
    """Full device KTS (scatter+DP+selection+backtrack in one jitted
    program, bucket-padded) == host C++/NumPy path at realistic video
    sizes (TVSum-scale: a few hundred subsampled frames)."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(42)
    for n, n_segments in [(200, 7), (437, 12)]:
        # piecewise-constant features + noise: well-separated change points
        bounds = np.sort(rng.choice(np.arange(10, n - 10), n_segments - 1,
                                    replace=False))
        segs = np.split(np.arange(n), bounds)
        feats = np.concatenate([
            np.tile(rng.randn(1, 16), (len(s), 1)) for s in segs])
        feats += 0.05 * rng.randn(n, 16)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        K = feats @ feats.T

        host_cps, _ = kts.cpd_auto(K, n - 1, 1)
        dev_cps, _ = kts.cpd_auto_device(K, n - 1, 1)
        np.testing.assert_array_equal(
            np.asarray(host_cps), np.asarray(dev_cps),
            err_msg=f"device KTS diverged from host at n={n}")


def test_cpd_auto_device_fallback_feasibility():
    """The f64 host fallback answers wherever the device path answers.

    Regression: with lmin=2 the ncp=n-1 clamp tripped cpd_auto's
    (m+1)*lmin <= n assertion, so the SAME call crashed or answered
    depending only on kernel magnitude; an lmax too small for the video
    similarly asserted where the device path returns the empty
    segmentation (all costs inf, m_best=0)."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(0)
    n = 40
    f = rng.randn(n, 4)
    K = (f @ f.T) / n
    big = K * 1e7   # n^2 * max|K| >> the f32 criterion -> forced fallback

    # lmin=2 + ncp=n-1: used to AssertionError on the fallback path
    cps_b, scores_b = kts.cpd_auto_device(big, ncp=n - 1, vmax=1.0, lmin=2)
    assert len(cps_b) >= 1 and (np.diff(cps_b) >= 2).all()
    assert np.isfinite(scores_b[-1])

    # lmax-infeasible (n > (ncp+1)*lmax): both paths answer empty
    cps_d, scores_d = kts.cpd_auto_device(K, ncp=2, vmax=1.0, lmax=5)
    cps_f, scores_f = kts.cpd_auto_device(big, ncp=2, vmax=1.0, lmax=5)
    for cps, scores in ((cps_d, scores_d), (cps_f, scores_f)):
        assert len(cps) == 0, cps
        assert np.isinf(scores).all(), scores


def test_cpd_auto_device_bucket_independent():
    """The same video must give the same change points whatever bucket it
    lands in (true length is traced, padding is masked out)."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(3)
    n = 100
    feats = np.repeat(rng.randn(5, 8), 20, axis=0) + 0.05 * rng.randn(n, 8)
    K = (feats @ feats.T).astype(np.float32)
    cps_small, _ = kts.cpd_auto_device(K, n - 1, 1, bucket_size=50)
    cps_large, _ = kts.cpd_auto_device(K, n - 1, 1, bucket_size=128)
    np.testing.assert_array_equal(cps_small, cps_large)


def test_cpd_auto_device_long_video_f32_bound():
    """Device f32 KTS == f64 host at >=1000 picks on NORMALIZED kernels
    (the production feature contract, video_helper.py:70-73): the f32
    scatter cumsums stay exact while n^2 * max|K| is under the measured
    ~1e8 boundary (see ops/kts.py:_DEVICE_F32_CRIT)."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(17)
    n, segs = 1200, 16
    bounds = np.sort(rng.choice(np.arange(20, n - 20), segs - 1,
                                replace=False))
    parts = np.split(np.arange(n), bounds)
    feats = np.concatenate([np.tile(rng.randn(1, 16), (len(s), 1))
                            for s in parts])
    feats += 0.05 * rng.randn(n, 16)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)  # |K| <= 1
    K = feats @ feats.T
    assert n * n * np.abs(K).max() <= kts._DEVICE_F32_CRIT

    host_cps, _ = kts.cpd_auto(K, n - 1, 1)
    dev_cps, _ = kts.cpd_auto_device(K, n - 1, 1)
    np.testing.assert_array_equal(np.asarray(host_cps),
                                  np.asarray(dev_cps))


def test_cpd_auto_device_falls_back_to_host_past_f32_bound():
    """Past the f32 criterion (large unnormalized kernels — measured to
    flip the device DP's model selection at n^2*max|K| >~ 2e8) the device
    entry point must transparently return the f64 host answer."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(11)
    n = 600
    feats = np.repeat(rng.randn(10, 16), 60, axis=0) + 0.05 * rng.randn(n, 16)
    feats *= 30.0                      # |K|max ~ 2e4 -> crit ~ 7e12
    K = feats @ feats.T
    assert n * n * np.abs(K).max() > kts._DEVICE_F32_CRIT

    host_cps, host_scores = kts.cpd_auto(K, n - 1, 1)
    dev_cps, dev_scores = kts.cpd_auto_device(K, n - 1, 1)
    np.testing.assert_array_equal(np.asarray(host_cps),
                                  np.asarray(dev_cps))
    np.testing.assert_allclose(host_scores, dev_scores)


def test_cpd_auto_device_fallback_clamps_ncp_like_device_path():
    """ncp >= n answers on BOTH sides of the f32 criterion: the device
    path caps the changepoint budget at n-1, and the f64 host fallback
    must apply the same cap instead of tripping cpd_auto's
    (m+1)*lmin <= n assertion — identical inputs except kernel magnitude
    must not flip between answer and crash."""
    from edsnet_tpu.ops import kts

    rng = np.random.RandomState(3)
    n = 80
    feats = np.repeat(rng.randn(4, 8), 20, axis=0) + 0.05 * rng.randn(n, 8)
    K_small = (feats @ feats.T).astype(np.float64)
    K_big = K_small * 1e5
    assert n * n * np.abs(K_small).max() <= kts._DEVICE_F32_CRIT
    assert n * n * np.abs(K_big).max() > kts._DEVICE_F32_CRIT

    # device path: already clamps (must keep answering)
    kts.cpd_auto_device(K_small, n, 1)
    # fallback path with the over-budget ncp == host at the clamped budget
    host_cps, host_scores = kts.cpd_auto(K_big, n - 1, 1)
    fb_cps, fb_scores = kts.cpd_auto_device(K_big, n, 1)
    np.testing.assert_array_equal(np.asarray(host_cps), np.asarray(fb_cps))
    np.testing.assert_allclose(host_scores, fb_scores)
