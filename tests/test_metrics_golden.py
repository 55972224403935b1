"""Golden-value tests for the metric math.

The reference has no tests of the metric formulas against known values
(SURVEY.md §4); here every metric is validated against an independent
host implementation (scipy sqrtm for FAD, naive numpy for KD/PRDC/APA).
"""

import numpy as np
import pytest
import scipy.linalg

from audio_metrics_tpu.data import AudioMetricsData
from audio_metrics_tpu.metrics.fad import (
    _frechet_distance,
    frechet_distance,
    trace_sqrtm_product,
)
from audio_metrics_tpu.metrics.kd import (
    kid_features_to_metric,
    mmd2,
    polynomial_kernel,
    rbf_kernel,
)
from audio_metrics_tpu.metrics.prdc import nearest_neighbour_distances, prdc
from audio_metrics_tpu.metrics.apa import _apa, apa


def _random_cov(rng, d, scale=1.0):
    a = rng.normal(size=(d, 2 * d))
    return scale * (a @ a.T) / (2 * d)


# ----------------------------------------------------------------------
# FAD
# ----------------------------------------------------------------------
@pytest.mark.parametrize("d", [4, 32, 128])
def test_trace_sqrtm_vs_scipy(d):
    rng = np.random.default_rng(d)
    sx = _random_cov(rng, d)
    sy = _random_cov(rng, d, scale=2.0)
    ours = trace_sqrtm_product(sx, sy)
    ref = np.trace(scipy.linalg.sqrtm(sx @ sy)).real
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_trace_sqrtm_ill_conditioned():
    # near-singular covariances (the practical failure mode of sqrtm)
    rng = np.random.default_rng(0)
    d = 16
    a = rng.normal(size=(d, 3))  # rank 3
    sx = a @ a.T
    sy = _random_cov(rng, d)
    ours = trace_sqrtm_product(sx, sy)
    ref = np.trace(scipy.linalg.sqrtm(sx @ sy)).real
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_frechet_distance_formula():
    rng = np.random.default_rng(1)
    d = 24
    mu_x, mu_y = rng.normal(size=(2, d))
    sx, sy = _random_cov(rng, d), _random_cov(rng, d)
    got = _frechet_distance(mu_x, sx, mu_y, sy)
    want = (
        np.sum((mu_x - mu_y) ** 2)
        + np.trace(sx)
        + np.trace(sy)
        - 2 * np.trace(scipy.linalg.sqrtm(sx @ sy)).real
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # identical distributions -> 0
    assert abs(_frechet_distance(mu_x, sx, mu_x, sx)) < 1e-8


def test_frechet_distance_newton_schulz():
    rng = np.random.default_rng(2)
    d = 32
    mu_x, mu_y = rng.normal(size=(2, d))
    sx, sy = _random_cov(rng, d), _random_cov(rng, d)
    ref = _frechet_distance(mu_x, sx, mu_y, sy, method="eigh")
    ns = _frechet_distance(mu_x, sx, mu_y, sy, method="newton_schulz")
    np.testing.assert_allclose(ns, ref, rtol=1e-4)


def test_frechet_distance_amd_interface():
    rng = np.random.default_rng(3)
    x = AudioMetricsData(False)
    y = AudioMetricsData(False)
    x.add(rng.normal(size=(500, 10)).astype(np.float32))
    y.add(rng.normal(loc=0.5, size=(400, 10)).astype(np.float32))
    val = frechet_distance(x, y)
    assert val > 0
    assert isinstance(val, float)


# ----------------------------------------------------------------------
# KD
# ----------------------------------------------------------------------
def _naive_mmd2_unbiased(f1, f2, kernel):
    k_xx = kernel(f1, f1)
    k_yy = kernel(f2, f2)
    k_xy = kernel(f1, f2)
    m = len(f1)
    s_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    s_yy = (k_yy.sum() - np.trace(k_yy)) / (m * (m - 1))
    return s_xx + s_yy - 2 * k_xy.sum() / (m * m)


def test_mmd2_estimators():
    rng = np.random.default_rng(4)
    f1 = rng.normal(size=(50, 8))
    f2 = rng.normal(size=(50, 8))
    kern = lambda a, b: polynomial_kernel(a, b, degree=3, gamma=None, coef0=1)
    got = mmd2(kern(f1, f1), kern(f1, f2), kern(f2, f2), mmd_est="unbiased")
    want = _naive_mmd2_unbiased(f1, f2, kern)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_kid_device_matches_naive_numpy():
    rng = np.random.default_rng(5)
    f1 = rng.normal(size=(300, 16)).astype(np.float32)
    f2 = rng.normal(loc=0.2, size=(280, 16)).astype(np.float32)
    out = kid_features_to_metric(f1, f2, kid_subsets=10, kid_subset_size=100)

    # replicate subset selection + naive numpy MMD
    r = np.random.default_rng(1234)
    kern = lambda a, b: polynomial_kernel(
        a.astype(np.float64), b.astype(np.float64), degree=3, gamma=1 / 16, coef0=1
    )
    mmds = []
    for _ in range(10):
        i1 = r.choice(300, 100, replace=False)
        i2 = r.choice(280, 100, replace=False)
        mmds.append(_naive_mmd2_unbiased(f1[i1], f2[i2], kern))
    np.testing.assert_allclose(
        out["kernel_distance_mean"], np.mean(mmds), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        out["kernel_distance_std"], np.std(mmds), rtol=1e-3, atol=1e-6
    )


def test_kid_rbf_kernel():
    rng = np.random.default_rng(6)
    f1 = rng.normal(size=(100, 8)).astype(np.float32)
    f2 = rng.normal(size=(100, 8)).astype(np.float32)
    out = kid_features_to_metric(
        f1, f2, kid_subsets=5, kid_subset_size=50, kernel_type="rbf"
    )
    assert np.isfinite(out["kernel_distance_mean"])

    # rbf helper vs direct formula
    k = rbf_kernel(f1[:10], f2[:10], sigma=3.0)
    d2 = ((f1[:10, None, :] - f2[None, :10, :]) ** 2).sum(-1)
    np.testing.assert_allclose(k, np.exp(-d2 / 18.0), rtol=1e-4, atol=1e-6)


def test_kid_subset_shrink():
    rng = np.random.default_rng(7)
    f = rng.normal(size=(30, 4)).astype(np.float32)
    out = kid_features_to_metric(f, f, kid_subsets=3)  # subset_size 1000 -> 15
    assert np.isfinite(out["kernel_distance_mean"])


def test_kid_identical_sets_near_zero():
    rng = np.random.default_rng(8)
    f = rng.normal(size=(500, 8)).astype(np.float32)
    out = kid_features_to_metric(f, f, kid_subsets=20, kid_subset_size=250)
    assert abs(out["kernel_distance_mean"]) < 0.05


# ----------------------------------------------------------------------
# PRDC
# ----------------------------------------------------------------------
def _naive_prdc(ref, cand, k):
    def radii(x):
        d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
        return np.sort(d, axis=1)[:, k]  # includes self-distance 0

    rr, cr = radii(ref), radii(cand)
    d = np.sqrt(((ref[:, None, :] - cand[None, :, :]) ** 2).sum(-1))
    precision = (d < rr[:, None]).any(axis=0).mean()
    recall = (d < cr[None, :]).any(axis=1).mean()
    density = (d < rr[:, None]).sum(axis=0).mean() / k
    coverage = (d.min(axis=1) < rr).mean()
    return dict(precision=precision, recall=recall, density=density, coverage=coverage)


def test_nearest_neighbour_distances():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(200, 6)).astype(np.float32)
    k = 5
    got = nearest_neighbour_distances(x, k)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    want = np.sort(d, axis=1)[:, k]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_prdc_vs_naive():
    rng = np.random.default_rng(10)
    ref = rng.normal(size=(300, 8)).astype(np.float32)
    cand = rng.normal(loc=0.3, size=(250, 8)).astype(np.float32)
    k = 5

    r = AudioMetricsData(True)
    r.add(ref)
    c = AudioMetricsData(True)
    c.add(cand)
    got = prdc(r, c, k)
    want = _naive_prdc(ref.astype(np.float64), cand.astype(np.float64), k)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-3, atol=1e-3)


def test_prdc_identical_sets():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(100, 4)).astype(np.float32)
    a = AudioMetricsData(True)
    a.add(x)
    b = AudioMetricsData(True)
    b.add(x)
    out = prdc(a, b, 3)
    assert out["precision"] == 1.0
    assert out["recall"] == 1.0
    assert out["coverage"] == 1.0


# ----------------------------------------------------------------------
# APA
# ----------------------------------------------------------------------
def test_apa_scalar_formula():
    # perfectly adherent: d(y,x)=0, d(y,x')=d(x,x') -> 1.0
    assert _apa(0.0, 2.0, 2.0) == 1.0
    # anti-adherent: d(y,x)=d(x,x'), d(y,x')=0 -> 0.0
    assert _apa(2.0, 0.0, 2.0) == 0.0
    # neutral: equidistant -> 0.5
    assert _apa(1.0, 1.0, 2.0) == 0.5
    # numerator dominates denominator -> clamped to [0, 1]
    assert _apa(0.0, 5.0, 1.0) == 1.0
    # degenerate: everything zero -> 0.0
    assert _apa(0.0, 0.0, 0.0) == 0.0
    # negative distances are clipped
    assert _apa(-1.0, 1.0, 1.0) == 1.0


def test_apa_distributions():
    rng = np.random.default_rng(12)
    ref = AudioMetricsData(False)
    anti = AudioMetricsData(False)
    cand = AudioMetricsData(False)
    base = rng.normal(size=(1000, 6)).astype(np.float32)
    ref.add(base)
    anti.add(base + 3.0)
    cand.add(base + rng.normal(scale=0.01, size=base.shape).astype(np.float32))
    val = apa(cand, ref, anti)
    assert 0.9 < val <= 1.0


# ----------------------------------------------------------------------
# KD reference-Gram (kt_yy) cache
# ----------------------------------------------------------------------
def test_kid_ref_gram_cache_hit_and_invalidation():
    """The reference-side kt_yy row sums are computed once per (reference,
    subset indices, kernel params) and reused across evaluates; a new
    reference array invalidates (VERDICT r3 item 2).  Values must be
    independent of cache state."""
    import jax.numpy as jnp

    from audio_metrics_tpu.metrics import kd as kd_mod

    rng = np.random.default_rng(7)
    ref = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    cand_a = rng.normal(size=(280, 16)).astype(np.float32)
    cand_b = rng.normal(loc=0.3, size=(280, 16)).astype(np.float32)

    kd_mod._KT_YY_CACHE.clear()
    kd_mod._KT_YY_KEEP.clear()

    out_a = kid_features_to_metric(cand_a, ref, kid_subsets=8, kid_subset_size=64)
    assert len(kd_mod._KT_YY_CACHE) == 1
    (cached_kt_yy,) = kd_mod._KT_YY_CACHE.values()

    out_b = kid_features_to_metric(cand_b, ref, kid_subsets=8, kid_subset_size=64)
    # same reference + same subset config -> cache hit, same object
    assert len(kd_mod._KT_YY_CACHE) == 1
    (kt_yy_after,) = kd_mod._KT_YY_CACHE.values()
    assert kt_yy_after is cached_kt_yy

    # cached-path value == fresh-cache value (bitwise: identical programs)
    kd_mod._KT_YY_CACHE.clear()
    kd_mod._KT_YY_KEEP.clear()
    out_b_fresh = kid_features_to_metric(
        cand_b, ref, kid_subsets=8, kid_subset_size=64
    )
    assert out_b == out_b_fresh
    assert out_a != out_b  # sanity: the two candidates differ

    # a NEW reference array is a new key (identity-based invalidation)
    ref2 = jnp.asarray(np.asarray(ref) + 0.5)
    kid_features_to_metric(cand_a, ref2, kid_subsets=8, kid_subset_size=64)
    assert len(kd_mod._KT_YY_CACHE) == 2


def test_kid_rbf_ref_gram_cache_matches_naive():
    """RBF path with hoisted row norms + kt_yy cache still matches the naive
    host formula."""
    from audio_metrics_tpu.metrics import kd as kd_mod

    rng = np.random.default_rng(8)
    f1 = rng.normal(size=(120, 12)).astype(np.float32)
    f2 = rng.normal(loc=0.1, size=(110, 12)).astype(np.float32)
    kd_mod._KT_YY_CACHE.clear()
    kd_mod._KT_YY_KEEP.clear()

    out = kid_features_to_metric(
        f1, f2, kernel_type="rbf", kid_sigma=3.0, kid_subsets=6, kid_subset_size=50
    )
    r = np.random.default_rng(1234)
    kern = lambda a, b: rbf_kernel(
        a.astype(np.float64), b.astype(np.float64), sigma=3.0
    )
    mmds = []
    for _ in range(6):
        i1 = r.choice(120, 50, replace=False)
        i2 = r.choice(110, 50, replace=False)
        mmds.append(_naive_mmd2_unbiased(f1[i1], f2[i2], kern))
    np.testing.assert_allclose(
        out["kernel_distance_mean"], np.mean(mmds), rtol=1e-4, atol=1e-6
    )
