"""IncrementalPCA parity vs sklearn (the reference subclasses sklearn's,
projection.py:6)."""

import numpy as np
import pytest
from sklearn.decomposition import IncrementalPCA as SkIPCA

from audio_metrics_tpu.projection import IncrementalPCA


@pytest.mark.parametrize("n,d,k", [(200, 30, 10), (500, 64, 16), (50, 10, 10)])
def test_single_partial_fit_matches_sklearn(n, d, k):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(n, d)) @ rng.normal(size=(d, d))

    ours = IncrementalPCA(n_components=k).partial_fit(x)
    sk = SkIPCA(n_components=k).partial_fit(x)

    np.testing.assert_allclose(ours.mean_, sk.mean_, rtol=1e-10)
    np.testing.assert_allclose(ours.singular_values_, sk.singular_values_, rtol=1e-8)
    np.testing.assert_allclose(ours.components_, sk.components_, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        ours.explained_variance_, sk.explained_variance_, rtol=1e-8
    )
    np.testing.assert_allclose(ours.noise_variance_, sk.noise_variance_, rtol=1e-8)

    y_ours = ours.transform(x)
    y_sk = sk.transform(x)
    np.testing.assert_allclose(y_ours, y_sk, rtol=1e-3, atol=1e-4)


def test_multiple_partial_fits_match_sklearn():
    rng = np.random.default_rng(42)
    k = 8
    ours = IncrementalPCA(n_components=k)
    sk = SkIPCA(n_components=k)
    for size in (100, 50, 200):
        x = rng.normal(size=(size, 20))
        ours.partial_fit(x)
        sk.partial_fit(x)
    np.testing.assert_allclose(ours.mean_, sk.mean_, rtol=1e-9)
    np.testing.assert_allclose(
        ours.singular_values_, sk.singular_values_, rtol=1e-7
    )
    np.testing.assert_allclose(ours.components_, sk.components_, rtol=1e-5, atol=1e-7)


def test_state_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(100, 12))
    pca = IncrementalPCA(n_components=5).partial_fit(x)
    state = pca.__getstate__()

    fresh = IncrementalPCA(n_components=5)
    fresh.__setstate__(state)
    np.testing.assert_allclose(pca.transform(x), fresh.transform(x), atol=1e-7)


def test_errors():
    pca = IncrementalPCA(n_components=5)
    with pytest.raises(RuntimeError):
        pca.transform(np.zeros((3, 5)))
    with pytest.raises(ValueError):
        pca.partial_fit(np.zeros((10, 3)))  # n_components > n_features
    with pytest.raises(ValueError):
        pca.partial_fit(np.zeros((3, 8)))  # first batch smaller than n_components
