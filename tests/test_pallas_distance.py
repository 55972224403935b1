"""Pallas distance-reduction kernels vs the XLA reference path (interpret
mode on CPU; the same kernels compile via Mosaic on TPU)."""

import numpy as np
import pytest

from audio_metrics_tpu.metrics.prdc import (
    nearest_neighbour_distances,
    pairwise_distance_stats,
)
from audio_metrics_tpu.ops.distance import knn_radii_pallas, pairwise_stats_pallas


@pytest.mark.parametrize("n,k", [(600, 5), (1100, 10), (40, 3)])
def test_knn_radii_matches_xla(n, k):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    want = nearest_neighbour_distances(x, k)
    got = knn_radii_pallas(x, k, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pairwise_stats_matches_xla():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(700, 16)).astype(np.float32)
    cand = rng.normal(loc=0.2, size=(900, 16)).astype(np.float32)
    k = 4
    rr = nearest_neighbour_distances(ref, k)
    cr = nearest_neighbour_distances(cand, k)

    want = pairwise_distance_stats(ref, cand, rr, cr, k)
    got = pairwise_stats_pallas(ref, cand, rr, cr, interpret=True)

    np.testing.assert_array_equal(got[0], want[0])  # cand_any
    np.testing.assert_array_equal(got[1], want[1])  # cand_count
    np.testing.assert_array_equal(got[2], want[2])  # ref_any
    np.testing.assert_allclose(got[3], want[3], rtol=1e-5, atol=1e-6)  # ref_min


def test_prdc_all_fused_matches_separate_kernels():
    """The single-dispatch fused PRDC pass (radii + sweeps in one jit) must
    match the separate kernels exactly."""
    import numpy as np
    from audio_metrics_tpu.ops.distance import (
        knn_radii_pallas,
        pairwise_stats_pallas,
        prdc_all_pallas,
    )

    rng = np.random.default_rng(11)
    ref = rng.normal(size=(300, 48)).astype(np.float32)
    cand = rng.normal(size=(450, 48)).astype(np.float32)
    k = 5
    rr, cr, ca, cc, ra, rm = prdc_all_pallas(ref, cand, k, interpret=True)
    rr0 = knn_radii_pallas(ref, k, interpret=True)
    cr0 = knn_radii_pallas(cand, k, interpret=True)
    ca0, cc0, ra0, rm0 = pairwise_stats_pallas(ref, cand, rr0, cr0, interpret=True)
    np.testing.assert_allclose(rr, rr0)
    np.testing.assert_allclose(cr, cr0)
    np.testing.assert_array_equal(ca, ca0)
    np.testing.assert_array_equal(cc, cc0)
    np.testing.assert_array_equal(ra, ra0)
    np.testing.assert_allclose(rm, rm0)
