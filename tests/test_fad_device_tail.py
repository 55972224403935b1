"""FAD device-tail (metrics/fad.fad_device_tail): the similarity transform
M = L^T C L runs on device in f32; host work shrinks to an eigvalsh
("packed" mode) or a sqrt-sum of pulled eigenvalues ("eigdev" mode).

Pins: (1) public-API evaluate() values match the all-host f64 path within
the measured f32-transform envelope on full-rank candidates, (2) the unit
semantics (pending preserved, stats still readable, exact fallback
conditions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.data import AudioMetricsData, batch_moments, flush_pending_stats
from audio_metrics_tpu.metrics.fad import fad_device_tail, frechet_distance
from audio_metrics_tpu.models.base import Embedder

SR = 16000
D = 32


class FullRankEmbedder(Embedder):
    """Data-dependent full-rank embeddings (the DummyEmbedder is rank-1,
    which exercises only the Cholesky-less fallback)."""

    names = ("embedding",)
    sr = SR

    def __init__(self):
        rng = np.random.default_rng(7)
        self._w = jnp.asarray(
            rng.standard_normal((256, D)).astype(np.float32)
        )

    def _embed(self, audio):
        a = jnp.asarray(audio, dtype=jnp.float32)
        return jnp.dot(a[:, :256], self._w)

    def forward(self, data):
        return {"embedding": self._embed(data["audio"])}

    @property
    def embed_fn(self):
        return lambda params, audio: self._embed(audio)


def _clips(seed, n_clips):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        0.2 * rng.standard_normal((n_clips, SR * 1)).astype(np.float32)
    )


def _run_eval(monkeypatch, mode):
    monkeypatch.setenv("AM_TPU_FAD_TAIL", mode)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=FullRankEmbedder(),
        win_dur=1.0,
        input_sr=SR,
        batch_size=32,
    )
    am.add_reference(_clips(0, 96))
    result = am.evaluate(_clips(1, 96))
    return result


@pytest.mark.parametrize("mode", ["packed", "eigdev", "nsdev"])
def test_public_api_matches_host_path(monkeypatch, mode):
    fast = _run_eval(monkeypatch, mode)
    host = _run_eval(monkeypatch, "host")
    # KD/PRDC never touch the FAD tail — bitwise equal
    for k in host:
        if k == "fad":
            continue
        assert fast[k] == host[k], k
    # f32 transform (+ f32 eigh in eigdev) vs f64 host path on a full-rank
    # candidate: measured ~1e-7 rel; 1e-5 bound leaves headroom
    assert fast["fad"] == pytest.approx(host["fad"], rel=1e-5, abs=1e-8)


def _amd_with_device_pending(e):
    n, s1, m2 = batch_moments(jnp.asarray(e))
    amd = AudioMetricsData(store_embeddings=False)
    amd.add_moments_device(int(e.shape[0]), s1, m2)
    return amd


def test_unit_value_and_pending_preserved():
    rng = np.random.default_rng(3)
    d = 64
    ref = AudioMetricsData(store_embeddings=False)
    ref.add(rng.standard_normal((400, d)).astype(np.float32))
    e = rng.standard_normal((300, d)).astype(np.float32)
    cand = _amd_with_device_pending(e)

    out = fad_device_tail(cand, ref, mode="packed")
    assert out is not None
    arrs, finish, defer = out
    assert defer is False
    # eigdev/nsdev defer their tiny pulls to the caller's last coalesced
    # transfer
    assert fad_device_tail(cand, ref, mode="eigdev")[2] is True
    assert fad_device_tail(cand, ref, mode="nsdev")[2] is True
    host_vals = flush_pending_stats([], extra=arrs)
    got = finish(host_vals)

    cand_host = AudioMetricsData(store_embeddings=False)
    cand_host.add(e)
    want = frechet_distance(cand_host, ref)
    assert got == pytest.approx(want, rel=1e-5)

    # the candidate's own moment was never consumed: stats still readable
    assert len(cand._pending) == 1
    np.testing.assert_allclose(cand.cov, cand_host.cov, rtol=1e-5, atol=1e-7)


def test_ns_trace_sqrt_ill_conditioned():
    """The nsdev Newton-Schulz trace-sqrt on a kappa=1e6 spectrum: tiny
    eigenvalues converge slowest, but their sqrt contributions are tiny, so
    the total stays in the f32 class.  Pins the accuracy envelope that
    justifies nsdev as the default tail."""
    from audio_metrics_tpu.metrics.fad import _ns_trace_sqrt_sym

    rng = np.random.default_rng(11)
    d = 128
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    vals = np.logspace(-6, 0, d)  # kappa = 1e6
    m = (q * vals) @ q.T
    m = 0.5 * (m + m.T)
    want = float(np.sqrt(vals).sum())
    got = float(_ns_trace_sqrt_sym(jnp.asarray(m, jnp.float32), 30))
    assert got == pytest.approx(want, rel=2e-4)
    # and on a well-conditioned spectrum the error is f32-roundoff class
    vals_ok = np.linspace(0.1, 1.0, d)
    m_ok = (q * vals_ok) @ q.T
    got_ok = float(_ns_trace_sqrt_sym(jnp.asarray(m_ok, jnp.float32), 30))
    assert got_ok == pytest.approx(float(np.sqrt(vals_ok).sum()), rel=1e-5)


def test_fallbacks():
    rng = np.random.default_rng(4)
    d = 64
    ref = AudioMetricsData(store_embeddings=False)
    ref.add(rng.standard_normal((400, d)).astype(np.float32))

    # n <= d: covariance possibly rank-deficient -> host path
    cand_small = _amd_with_device_pending(
        rng.standard_normal((d - 4, d)).astype(np.float32)
    )
    assert fad_device_tail(cand_small, ref, mode="packed") is None

    # mode=host
    cand = _amd_with_device_pending(
        rng.standard_normal((300, d)).astype(np.float32)
    )
    assert fad_device_tail(cand, ref, mode="host") is None

    # several pending triples (host-fed batch path) -> host path
    n2, s12, m22 = batch_moments(
        jnp.asarray(rng.standard_normal((300, d)).astype(np.float32))
    )
    cand.add_moments_device(300, s12, m22)
    assert fad_device_tail(cand, ref, mode="packed") is None

    # rank-deficient reference (no Cholesky) -> host path
    low = rng.standard_normal((400, 3)).astype(np.float32)
    ref_low = AudioMetricsData(store_embeddings=False)
    ref_low.add(low @ rng.standard_normal((3, d)).astype(np.float32))
    cand2 = _amd_with_device_pending(
        rng.standard_normal((300, d)).astype(np.float32)
    )
    assert fad_device_tail(cand2, ref_low, mode="packed") is None

    # flushed candidate (no pending) -> host path
    cand3 = AudioMetricsData(store_embeddings=False)
    cand3.add(rng.standard_normal((300, d)).astype(np.float32))
    assert fad_device_tail(cand3, ref, mode="packed") is None
