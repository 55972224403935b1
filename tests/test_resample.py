"""Resampler quality: measured SNR vs analytic references (README table).
Direct golden parity vs scipy's C upfirdn path lives in test_dsp.py."""

import numpy as np



def _multitone_snr(sr_in, sr_out, quality):
    """SNR against the analytic band-limited reference (the true resampled
    signal of a sum of tones is the same tones sampled at the new rate)."""
    from audio_metrics_tpu.ops.resample import resample_batch

    dur = 2.0
    freqs = [220.0, 997.0, 3001.0, 6500.0]  # all < 0.8 * min-Nyquist
    t_in = np.arange(int(sr_in * dur)) / sr_in
    x = sum(
        np.sin(2 * np.pi * f * t_in + 0.1 * i) for i, f in enumerate(freqs)
    ).astype(np.float32)
    y = np.asarray(resample_batch(x[None], sr_in, sr_out, quality))[0]
    t_out = np.arange(len(y)) / sr_out
    ref = sum(np.sin(2 * np.pi * f * t_out + 0.1 * i) for i, f in enumerate(freqs))
    m = slice(4000, len(y) - 4000)
    err = y[m] - ref[m]
    return 10 * np.log10(np.mean(ref[m] ** 2) / np.mean(err**2))


def test_resample_quality_hq_snr():
    """Default quality == scipy resample_poly design: ~55-61 dB measured
    (documented vs soxr in README deviations)."""
    assert _multitone_snr(44100, 48000, "hq") > 55
    assert _multitone_snr(48000, 16000, "hq") > 52


def test_resample_quality_vhq_snr():
    """vhq (Kaiser beta 14): near the f32 noise floor, soxr-VHQ territory."""
    assert _multitone_snr(44100, 48000, "vhq") > 120
    assert _multitone_snr(48000, 16000, "vhq") > 120
    assert _multitone_snr(16000, 48000, "vhq") > 120
