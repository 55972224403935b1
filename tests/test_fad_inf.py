"""FAD-inf (sample-bias-corrected FAD; beyond-reference extension).

Validates the device subset sweep against an independent numpy/f64 oracle
with identical subsets, the bias-correction behaviour (plain FAD carries a
positive O(d/N) sample bias; the 1/s -> 0 extrapolation removes most of
it), and the public-API wiring (metric key ``fad_inf``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_metrics_tpu.data import AudioMetricsData
from audio_metrics_tpu.metrics.fad import (
    _frechet_distance,
    fad_inf_parts,
    frechet_distance,
)


def _amd(embeddings):
    a = AudioMetricsData(True)
    a.add(np.asarray(embeddings, np.float32))
    return a


def test_fad_inf_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    d, n_cand, n_ref, n_points = 16, 400, 500, 8
    ref_e = rng.standard_normal((n_ref, d))
    cand_e = 1.1 * rng.standard_normal((n_cand, d)) + 0.05
    ref, cand = _amd(ref_e), _amd(cand_e)

    arrs, reduce_fn = fad_inf_parts(cand, ref, n_points=n_points, seed=7)
    out = reduce_fn(jax.device_get(arrs))

    # independent oracle: same subset construction, f64 per-subset FAD
    sizes = np.unique(
        np.round(np.linspace(max(d + 2, 0.25 * n_cand), n_cand, n_points)).astype(
            np.int64
        )
    )
    srng = np.random.default_rng(7)
    fads = []
    for s in sizes:
        idx = (
            np.arange(n_cand) if s == n_cand else srng.permutation(n_cand)[:s]
        )
        sub = np.asarray(cand_e, np.float64)[idx]
        mu = sub.mean(axis=0)
        cov = np.cov(sub, rowvar=False)
        fads.append(
            _frechet_distance(
                mu, cov, np.asarray(ref.mean), np.asarray(ref.cov)
            )
        )
    slope, intercept = np.polyfit(1.0 / sizes.astype(np.float64), fads, 1)
    # f32 device sweep vs f64 oracle: intercept agrees to the f32 class
    assert abs(out["fad_inf"] - intercept) < 5e-3 * max(1.0, abs(intercept))
    assert abs(out["fad_inf_slope"] - slope) < 2e-2 * max(1.0, abs(slope))


def test_fad_inf_removes_sample_bias():
    rng = np.random.default_rng(1)
    d, n = 16, 320
    ref = _amd(rng.standard_normal((4000, d)))  # tight reference fit
    cand = _amd(rng.standard_normal((n, d)))  # SAME distribution
    plain = frechet_distance(cand, ref)
    arrs, reduce_fn = fad_inf_parts(cand, ref, seed=3)
    corrected = reduce_fn(jax.device_get(arrs))["fad_inf"]
    assert plain > 0.1  # the O(d/N) bias is visible at this n
    assert abs(corrected) < 0.6 * plain  # extrapolation removes most of it


def test_fad_inf_skips_when_unavailable():
    rng = np.random.default_rng(2)
    d = 16
    ref = _amd(rng.standard_normal((200, d)))
    tiny = _amd(rng.standard_normal((d - 2, d)))  # n <= d+1: rank-deficient
    assert fad_inf_parts(tiny, ref) is None
    no_emb = AudioMetricsData(False)
    no_emb.add(np.asarray(rng.standard_normal((100, d)), np.float32))
    assert fad_inf_parts(no_emb, ref) is None


class _ProjEmbedder:
    """Full-rank test embedder (the dummy's rank-1 outer product cannot
    exercise fad_inf: the reference covariance has no Cholesky factor)."""

    names = ("embedding",)
    sr = 16000

    def __init__(self, d=12, win=5 * 16000):
        rng = np.random.default_rng(5)
        self._w = jnp.asarray(
            rng.standard_normal((win, d)).astype(np.float32) / np.sqrt(win)
        )

    def forward(self, data):
        return {"embedding": jnp.asarray(data["audio"]) @ self._w}

    @property
    def embed_fn(self):
        w = self._w
        return lambda params, audio: audio @ w


def test_fad_inf_through_public_api():
    from audio_metrics_tpu import AudioMetrics

    rng = np.random.default_rng(6)
    sr = 16000
    ref = (0.3 * rng.standard_normal((40, 5 * sr))).astype(np.float32)
    cand = (0.3 * rng.standard_normal((40, 5 * sr))).astype(np.float32)
    am = AudioMetrics(
        metrics=["fad", "fad_inf"],
        embedder=_ProjEmbedder(),
        win_dur=5.0,
        input_sr=sr,
        batch_size=16,
    )
    am.add_reference(ref)
    res = am.evaluate(cand)
    assert "fad" in res and "fad_inf" in res and "fad_inf_slope" in res
    # same distribution: the corrected value drops below the plain one
    assert res["fad_inf"] < res["fad"]
    # deterministic across calls
    res2 = am.evaluate(cand)
    assert res2["fad_inf"] == res["fad_inf"]
