"""DSP op tests: resampler vs scipy, IIR vs scipy.lfilter, BS.1770 loudness
vs a direct numpy spec implementation, limiter vs a pure-python recurrence,
and the mix-function registry."""

import numpy as np
import pytest
import scipy.signal as ss

from audio_metrics_tpu.ops.resample import resample, resample_batch
from audio_metrics_tpu.ops.iir import biquad_cascade, k_weighting_coeffs
from audio_metrics_tpu.ops.loudness import integrated_loudness_batch, CHANNEL_GAINS
from audio_metrics_tpu.ops.limiter import limit_batch
from audio_metrics_tpu.ops import mix as mix_ops


# ----------------------------------------------------------------------
# resampling
# ----------------------------------------------------------------------
@pytest.mark.parametrize("so,sn", [(48000, 16000), (16000, 48000), (44100, 48000)])
def test_resample_matches_scipy(so, sn):
    rng = np.random.default_rng(so % 97)
    x = rng.normal(size=so // 2)
    g = np.gcd(so, sn)
    ref = ss.resample_poly(x, sn // g, so // g)
    ours = resample(x, so, sn)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_resample_batch_and_stereo():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 24000, 2)).astype(np.float32)
    y = np.asarray(resample_batch(x, 48000, 16000))
    assert y.shape == (4, 8000, 2)
    ref = ss.resample_poly(x[2, :, 1].astype(np.float64), 1, 3)
    np.testing.assert_allclose(y[2, :, 1], ref, atol=2e-6)


def test_resample_identity():
    x = np.random.default_rng(2).normal(size=(2, 100))
    np.testing.assert_array_equal(np.asarray(resample_batch(x, 16000, 16000)), x.astype(np.float32))


def test_resample_preserves_tone():
    # a 440 Hz tone must survive 48k -> 16k with tiny error away from edges
    sr, dur = 48000, 1.0
    t = np.arange(int(sr * dur)) / sr
    x = np.sin(2 * np.pi * 440 * t)
    y = resample(x, 48000, 16000)
    t2 = np.arange(len(y)) / 16000
    want = np.sin(2 * np.pi * 440 * t2)
    err = np.abs(y[200:-200] - want[200:-200]).max()
    assert err < 1e-3


# ----------------------------------------------------------------------
# IIR / K-weighting
# ----------------------------------------------------------------------
def test_biquad_cascade_matches_scipy_lfilter():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 4800))
    b, a = k_weighting_coeffs(48000.0)
    want = x.copy()
    for s in range(2):
        want = ss.lfilter(b[s], a[s], want, axis=1)
    got = np.asarray(biquad_cascade(x, b, a))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_k_weighting_gain_profile():
    # K-weighting: ~0 dB at 1 kHz, +4 dB shelf at high freq, cut below 40 Hz
    b, a = k_weighting_coeffs(48000.0)

    def gain_db(f):
        w, h1 = ss.freqz(b[0], a[0], worN=[f], fs=48000)
        w, h2 = ss.freqz(b[1], a[1], worN=[f], fs=48000)
        return 20 * np.log10(np.abs(h1 * h2))[0]

    # +0.691 dB at 997 Hz — the constant the -0.691 loudness offset cancels
    assert abs(gain_db(997.0) - 0.691) < 0.1
    assert 3.5 < gain_db(10000.0) < 4.7
    assert gain_db(20.0) < -10


# ----------------------------------------------------------------------
# loudness
# ----------------------------------------------------------------------
def _numpy_bs1770(x, sr):
    """Direct numpy implementation of BS.1770-4 integrated loudness
    (independent check; same math as the reference's numba kernel,
    mix_functions.py:12-66)."""
    b, a = k_weighting_coeffs(sr)
    y = x.astype(np.float64)
    if y.ndim == 1:
        y = y[:, None]
    for s in range(2):
        y = ss.lfilter(b[s], a[s], y, axis=0)
    block = int(0.4 * sr)
    stride = int(0.1 * sr)
    n_blocks = (len(y) - block) // stride + 1
    z = np.stack(
        [(y[i * stride : i * stride + block] ** 2).mean(axis=0) for i in range(n_blocks)]
    ).T  # (C, n_blocks)
    g = CHANNEL_GAINS[: z.shape[0]]
    with np.errstate(divide="ignore"):
        l = -0.691 + 10 * np.log10(g @ z)
    j = l >= -70.0
    if not j.any():
        return -np.inf
    gamma_r = -0.691 + 10 * np.log10(g @ z[:, j].mean(axis=1)) - 10
    j2 = (l > gamma_r) & (l > -70.0)
    if not j2.any():
        return -np.inf
    return -0.691 + 10 * np.log10(g @ z[:, j2].mean(axis=1))


@pytest.mark.parametrize("sr", [48000, 44100, 16000])
@pytest.mark.parametrize("method,rtol", [("scan", 1e-8), ("fir", 2e-5), ("blocked", 2e-5), ("blocked-parallel", 2e-6)])
def test_integrated_loudness_vs_numpy(sr, method, rtol):
    rng = np.random.default_rng(sr % 13)
    n = int(2.0 * sr)
    batch = np.stack(
        [
            0.1 * rng.normal(size=n),
            0.01 * np.sin(2 * np.pi * 440 * np.arange(n) / sr),
            0.5 * rng.normal(size=n) * np.linspace(0, 1, n),
        ]
    )
    got = np.asarray(integrated_loudness_batch(batch, sr, method=method))
    for i in range(len(batch)):
        want = _numpy_bs1770(batch[i], sr)
        np.testing.assert_allclose(got[i], want, rtol=rtol, atol=1e-10)


def test_loudness_sine_reference_level():
    # a full-scale 997 Hz sine has loudness ~ -3.01 LUFS (BS.1770 anchor)
    sr = 48000
    t = np.arange(int(5 * sr)) / sr
    x = np.sin(2 * np.pi * 997 * t)
    got = float(np.asarray(integrated_loudness_batch(x[None], sr))[0])
    assert abs(got - (-3.01)) < 0.1


def test_loudness_gain_linearity_anchor():
    """BS.1770 spec property: applying a gain of g dB shifts integrated
    loudness by exactly g LU (absolute calibration beyond the single
    full-scale anchor; not an in-repo-oracle comparison)."""
    sr = 48000
    t = np.arange(int(5 * sr)) / sr
    base = -3.0103  # full-scale 997 Hz sine
    for a in (0.5, 0.1, 0.01):
        x = (a * np.sin(2 * np.pi * 997 * t))[None]
        got = float(np.asarray(integrated_loudness_batch(x, sr))[0])
        want = base + 20 * np.log10(a)
        assert abs(got - want) < 0.05, (a, got, want)


def test_loudness_relative_gate_excludes_quiet_tail():
    """The -10 LU relative gate (BS.1770-4 gating) must exclude a long
    quiet tail: integrated loudness of loud+quiet ~= loudness of the loud
    segment alone, NOT the energy mean (which would be ~7 LU lower for a
    3x-longer -40 dB tail)."""
    sr = 48000
    loud = 0.35 * np.sin(2 * np.pi * 997 * np.arange(int(5 * sr)) / sr)
    quiet = (0.35 * 10 ** (-40 / 20)) * np.sin(
        2 * np.pi * 997 * np.arange(int(15 * sr)) / sr
    )
    both = np.concatenate([loud, quiet])[None]
    got = float(np.asarray(integrated_loudness_batch(both, sr))[0])
    loud_only = float(np.asarray(integrated_loudness_batch(loud[None], sr))[0])
    energy_mean = loud_only + 10 * np.log10(
        (5 + 15 * 10 ** (-40 / 10)) / 20.0
    )
    assert abs(got - loud_only) < 0.15, (got, loud_only)
    assert got - energy_mean > 4.0  # the gate really engaged


def test_loudness_silence_is_neg_inf():
    sr = 16000
    x = np.zeros((1, 2 * sr))
    got = float(np.asarray(integrated_loudness_batch(x, sr))[0])
    assert got == -np.inf


def test_loudness_multichannel():
    sr = 48000
    rng = np.random.default_rng(9)
    x = 0.1 * rng.normal(size=(2, sr, 2))
    got = np.asarray(integrated_loudness_batch(x, sr))
    for i in range(2):
        want = _numpy_bs1770(x[i], sr)
        np.testing.assert_allclose(got[i], want, rtol=2e-5)


# ----------------------------------------------------------------------
# limiter
# ----------------------------------------------------------------------
def _python_limiter(x, attack=0.99, release=0.99, delay=527, threshold=0.5):
    delay_line = np.zeros(delay)
    idx = 0
    envelope, gain = 0.0, 1.0
    out = np.empty_like(x)
    for i, sample in enumerate(x):
        delay_line[idx] = sample
        idx = (idx + 1) % delay
        envelope = max(abs(sample), envelope * release)
        target_gain = threshold / envelope if envelope > threshold else 1.0
        gain = gain * attack + target_gain * (1 - attack)
        out[i] = delay_line[idx] * gain
    return out


def test_limiter_matches_python_recurrence():
    rng = np.random.default_rng(10)
    x = (2.5 * rng.normal(size=4000)).astype(np.float32)
    got = np.asarray(limit_batch(x[None]))[0]
    want = _python_limiter(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_limiter_blocked_matches_scan():
    """The parallel (cummax + blocked-lfilter) limiter must reproduce the
    sequential scan oracle to f32 tolerance, clipping or not."""
    rng = np.random.default_rng(11)
    for scale in (0.3, 1.7):  # below and above the clip point
        x = (scale * rng.normal(size=(2, 50_000))).astype(np.float32)
        a = np.asarray(limit_batch(x, method="scan"))
        b = np.asarray(limit_batch(x, method="blocked"))
        np.testing.assert_allclose(b, a, atol=5e-6)
    # aggressive release: the r^-j chunk weights must not overflow f32
    # (the chunk size adapts)
    x = (1.6 * rng.normal(size=(2, 20_000))).astype(np.float32)
    a = np.asarray(limit_batch(x, release_coeff=0.75, method="scan"))
    b = np.asarray(limit_batch(x, release_coeff=0.75, method="blocked"))
    np.testing.assert_allclose(b, a, atol=5e-6)


def test_limiter_caps_peaks():
    t = np.arange(48000) / 48000.0
    x = (3.0 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    y = np.asarray(limit_batch(x[None]))[0]
    # after the attack settles, output is bounded near the 0.5 threshold * 3 / envelope
    assert np.abs(y[5000:]).max() <= 1.0


# ----------------------------------------------------------------------
# mix functions
# ----------------------------------------------------------------------
def test_registry_complete():
    assert set(mix_ops.MIX_FUNCTIONS) == {"PP", "P0", "P1", "P2", "L0", "L1", "L2"}
    assert mix_ops.DEFAULT_MIX_FUNCTION == "L0"
    for fn in mix_ops.MIX_FUNCTIONS.values():
        assert getattr(fn, "is_batched_mix", False)


def test_mix_peak_preserve():
    rng = np.random.default_rng(11)
    a = rng.normal(size=(100, 2)).astype(np.float32)
    out = np.asarray(mix_ops.mix_tracks_peak_preserve(a, sr=16000))
    assert out.shape == (100,)
    np.testing.assert_allclose(
        np.abs(out).max(), np.abs(a).max(), rtol=1e-5
    )
    # silent input passes channel 0 through
    out = np.asarray(mix_ops.mix_tracks_peak_preserve(np.zeros((50, 2)), sr=16000))
    np.testing.assert_array_equal(out, np.zeros(50))


def test_mix_peak_normalize():
    rng = np.random.default_rng(12)
    a = rng.normal(size=(4, 100, 2)).astype(np.float32)
    out = np.asarray(mix_ops.MIX_FUNCTIONS["P1"](a, sr=16000))
    assert out.shape == (4, 100)
    want_peak = 10 ** (-3 / 20)
    np.testing.assert_allclose(np.abs(out).max(axis=1), want_peak, rtol=1e-5)


def test_mix_loudness_properties():
    sr = 16000
    rng = np.random.default_rng(13)
    n = 5 * sr
    ctx = 0.3 * rng.normal(size=(3, n))
    stem = 0.05 * np.sin(2 * np.pi * 330 * np.arange(n) / sr) * np.ones((3, 1))
    audio = np.stack([ctx, stem], axis=2).astype(np.float32)

    out = np.asarray(mix_ops.MIX_FUNCTIONS["L0"](audio, sr=sr))
    assert out.shape == (3, n)
    # mix is normalized to -20 LUFS
    lufs = np.asarray(integrated_loudness_batch(out.astype(np.float64), sr))
    np.testing.assert_allclose(lufs, -20.0, atol=0.01)
    # stem set to equal loudness of context: both present in the mix
    assert np.isfinite(out).all()

    # single-item call (reference per-item protocol)
    out1 = np.asarray(mix_ops.MIX_FUNCTIONS["L0"](audio[0], sr=sr))
    np.testing.assert_allclose(out1, out[0], atol=1e-6)


def test_mix_loudness_silent_cases():
    sr = 16000
    n = 5 * sr
    rng = np.random.default_rng(14)
    loud = 0.3 * rng.normal(size=n)
    both_silent = np.zeros((n, 2), np.float32)
    out = np.asarray(mix_ops.MIX_FUNCTIONS["L0"](both_silent, sr=sr))
    np.testing.assert_array_equal(out, np.zeros(n))

    one_silent = np.stack([loud, np.zeros(n)], axis=1).astype(np.float32)
    out = np.asarray(mix_ops.MIX_FUNCTIONS["L0"](one_silent, sr=sr))
    # mix falls back to the non-silent channel, then is normalized to -20 LUFS
    lufs = float(np.asarray(integrated_loudness_batch(out[None].astype(np.float64), sr))[0])
    assert abs(lufs - (-20.0)) < 0.01


# ----------------------------------------------------------------------
# failure-detection parity: silent-channel / gain-reduction warnings
# (reference mix_functions.py:270,293-299)
# ----------------------------------------------------------------------
def test_mix_warns_on_both_channels_silent():
    import warnings as w
    from audio_metrics_tpu.ops.mix import mix_tracks_loudness

    audio = np.zeros((2, 16000, 2), np.float32)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        mix_tracks_loudness(audio, sr=16000)
    assert any("Both channels silent" in str(r.message) for r in rec), [
        str(r.message) for r in rec
    ]


def test_mix_warns_on_one_channel_silent():
    import warnings as w
    from audio_metrics_tpu.ops.mix import mix_tracks_loudness

    rng = np.random.default_rng(0)
    audio = np.zeros((1, 16000, 2), np.float32)
    audio[:, :, 0] = 0.3 * rng.normal(size=(1, 16000))
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        mix_tracks_loudness(audio, sr=16000)
    assert any("One channel silent" in str(r.message) for r in rec)


def test_mix_warns_on_gain_reduction():
    import warnings as w
    from audio_metrics_tpu.ops.mix import mix_tracks_loudness

    rng = np.random.default_rng(1)
    # sparse impulse train: normalizing up to -20 LUFS pushes peaks past 1.0
    spike = 1e-5 * rng.normal(size=(1, 16000))
    spike[0, ::800] = 2e-2
    audio = np.stack([spike, spike], axis=2).astype(np.float32)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        mix_tracks_loudness(audio, sr=16000)
    assert any("Reducing gain" in str(r.message) for r in rec), [
        str(r.message) for r in rec
    ]


def test_mix_diag_deferred_no_warning_leak():
    """With a diag collector, warnings fire only at emit time (and padding
    rows are excluded via the 'valid' mask)."""
    import warnings as w
    from audio_metrics_tpu.ops.mix import mix_tracks_loudness, emit_mix_diagnostics

    rng = np.random.default_rng(2)
    audio = np.zeros((4, 16000, 2), np.float32)
    audio[:2] = 0.3 * rng.normal(size=(2, 16000, 2))  # rows 2,3 are padding
    diag = []
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        mix_tracks_loudness(audio, sr=16000, diag=diag)
    assert not any("silent" in str(r.message) for r in rec)
    diag[-1]["valid"] = np.array([True, True, False, False])
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        emit_mix_diagnostics(diag)
    assert not any("silent" in str(r.message) for r in rec)  # pad masked out
