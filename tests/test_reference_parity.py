"""Numerical parity vs the upstream reference implementation.

Loads the reference's metric modules (torch, CPU) file-by-file — its package
__init__ pulls in deps that are absent here (soxr), but data.py and
metrics/{fad,kd,prdc}.py are dependency-light — and compares our TPU-native
implementations on identical inputs.  Skipped when /root/reference is not
mounted.  Target: << 1e-4 relative error (BASELINE.md).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/audio_metrics")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    pkg = types.ModuleType("audio_metrics")
    pkg.__path__ = [str(REF)]
    sys.modules.setdefault("audio_metrics", pkg)
    sub = types.ModuleType("audio_metrics.metrics")
    sub.__path__ = [str(REF / "metrics")]
    sys.modules.setdefault("audio_metrics.metrics", sub)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mods = types.SimpleNamespace(torch=torch)
    mods.prdc = load("audio_metrics.metrics.prdc", REF / "metrics/prdc.py")
    mods.data = load("audio_metrics.data", REF / "data.py")
    mods.fad = load("audio_metrics.metrics.fad", REF / "metrics/fad.py")
    mods.kd = load("audio_metrics.metrics.kd", REF / "metrics/kd.py")
    return mods


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(0)
    e1 = rng.normal(size=(1500, 48)).astype(np.float32)
    e2 = (rng.normal(size=(1300, 48)) * 1.3 + 0.2).astype(np.float32)
    return e1, e2


def _ref_amd(ref, e, chunks=7):
    amd = ref.data.AudioMetricsData(True)
    for c in np.array_split(e, chunks):
        amd.add(ref.torch.as_tensor(c))
    return amd


def _our_amd(e, chunks=7):
    from audio_metrics_tpu.data import AudioMetricsData

    amd = AudioMetricsData(True)
    for c in np.array_split(e, chunks):
        amd.add(c)
    return amd


def test_stats_parity(ref, embeddings):
    e1, _ = embeddings
    ra, oa = _ref_amd(ref, e1), _our_amd(e1)
    np.testing.assert_allclose(ra.mean.numpy(), oa.mean, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(ra.cov.numpy(), oa.cov, rtol=1e-5, atol=1e-7)


def test_fad_parity(ref, embeddings):
    from audio_metrics_tpu.metrics.fad import _frechet_distance

    e1, e2 = embeddings
    ra, rb = _ref_amd(ref, e1), _ref_amd(ref, e2, 5)
    oa, ob = _our_amd(e1), _our_amd(e2, 5)
    want = ref.fad._frechet_distance(ra.mean, ra.cov, rb.mean, rb.cov).item()
    got = _frechet_distance(oa.mean, oa.cov, ob.mean, ob.cov)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kd_parity(ref, embeddings):
    from audio_metrics_tpu.metrics.kd import kid_features_to_metric

    e1, e2 = embeddings
    want = ref.kd.kid_features_to_metric(e1, e2, kid_subsets=20, kid_subset_size=400)
    got = kid_features_to_metric(e1, e2, kid_subsets=20, kid_subset_size=400)
    np.testing.assert_allclose(
        got["kernel_distance_mean"], want["kernel_distance_mean"], rtol=1e-5
    )
    np.testing.assert_allclose(
        got["kernel_distance_std"], want["kernel_distance_std"], rtol=1e-3
    )


def test_prdc_parity(ref, embeddings):
    from audio_metrics_tpu.metrics.prdc import prdc

    e1, e2 = embeddings
    ra, rb = _ref_amd(ref, e1), _ref_amd(ref, e2, 5)
    oa, ob = _our_amd(e1), _our_amd(e2, 5)
    want = ref.prdc.prdc(ra, rb, 5)
    got = prdc(oa, ob, 5)
    for key, val in want.items():
        np.testing.assert_allclose(got[key], val, rtol=1e-6, atol=1e-6)
