"""Log-mel spectrogram frontend, GEMM-native.

The embedders' audio frontends (reference: torchlibrosa conv-STFT inside
laion_clap's HTSAT, and torchvggish's numpy mel_features) are rebuilt here as
matrix multiplications: framing is a strided gather, the DFT is two matmuls
with precomputed ``window * cos`` / ``window * sin`` matrices, and the mel
projection is a third matmul.  At n_fft 512-1024 this maps straight onto the
MXU and fuses with the surrounding elementwise ops — no FFT kernel needed.

Two mel-filterbank conventions are provided, matching the two model families:

- ``mel_scale="htk", norm=None`` — torchaudio/VGGish convention
  (torchvggish mel_features: HTK scale, unnormalized triangles)
- ``mel_scale="slaney", norm="slaney"`` — librosa convention used by
  laion_clap's LogmelFilterBank for the non-fusion CLAP path.

Validated against ``transformers.audio_utils`` (same formulas as librosa) in
tests/test_mel.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["mel_filter_bank", "log_mel_spectrogram", "stft_power"]


# ----------------------------------------------------------------------
# filter design (host, cached)
# ----------------------------------------------------------------------
def _hertz_to_mel(freq, mel_scale: str):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hertz(mels, mel_scale: str):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=None)
def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
    norm: str | None = None,
    mel_scale: str = "htk",
    triangle_domain: str = "hz",
    zero_dc: bool = False,
) -> np.ndarray:
    """Triangular mel filterbank, shape (num_frequency_bins, num_mel_filters).

    triangle_domain="hz": librosa / torchaudio / transformers.audio_utils
    construction (triangle slopes in hertz).  triangle_domain="mel": the
    TF/VGGish construction (slopes in mel units); combined with
    ``zero_dc=True`` this reproduces torchvggish's
    ``spectrogram_to_mel_matrix`` exactly.
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = _hertz_to_mel(min_frequency, mel_scale)
    mel_max = _hertz_to_mel(max_frequency, mel_scale)
    mel_points = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz(mel_points, mel_scale)

    if triangle_domain == "mel":
        with np.errstate(divide="ignore", invalid="ignore"):
            spec_mels = _hertz_to_mel(fft_freqs, mel_scale)
            lower = mel_points[:-2][np.newaxis, :]
            center = mel_points[1:-1][np.newaxis, :]
            upper = mel_points[2:][np.newaxis, :]
            up_slope = (spec_mels[:, np.newaxis] - lower) / (center - lower)
            down_slope = (upper - spec_mels[:, np.newaxis]) / (upper - center)
            weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    else:
        fdiff = np.diff(filter_freqs)
        slopes = filter_freqs[np.newaxis, :] - fft_freqs[:, np.newaxis]
        down = -slopes[:, :-2] / fdiff[:-1]
        up = slopes[:, 2:] / fdiff[1:]
        weights = np.maximum(0.0, np.minimum(down, up))
    if zero_dc:
        weights[0, :] = 0.0

    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        weights *= enorm[np.newaxis, :]
    return weights


@lru_cache(maxsize=None)
def _dft_matrices(frame_length: int, n_fft: int, window: str):
    """(frame_length, n_bins) windowed cos/sin matrices for a real DFT."""
    if window == "hann":
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_length) / frame_length)
    elif window == "ones":
        win = np.ones(frame_length)
    else:
        raise ValueError(f"unknown window {window!r}")
    n_bins = n_fft // 2 + 1
    # frame samples occupy the first frame_length points of the n_fft DFT
    k = np.arange(n_bins)[None, :]
    t = np.arange(frame_length)[:, None]
    angle = 2.0 * np.pi * k * t / n_fft
    cos_m = (np.cos(angle) * win[:, None]).astype(np.float32)
    sin_m = (-np.sin(angle) * win[:, None]).astype(np.float32)
    return cos_m, sin_m


# ----------------------------------------------------------------------
# device ops
# ----------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "frame_length",
        "hop_length",
        "n_fft",
        "window",
        "center",
        "power",
        "compute_dtype",
    ),
)
def stft_power(
    audio,
    frame_length: int,
    hop_length: int,
    n_fft: int | None = None,
    window: str = "hann",
    center: bool = True,
    power: float = 2.0,
    compute_dtype=None,
):
    """Magnitude (power=1) or power (power=2) spectrogram via matmul-DFT.

    audio: (B, n) -> (B, n_frames, n_fft//2 + 1) float32.
    center=True reflect-pads by frame_length//2 (torch.stft convention).
    """
    x = jnp.asarray(audio, dtype=jnp.float32)
    if n_fft is None:
        n_fft = frame_length
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    # framing + windowed DFT as ONE strided convolution: kernel rows are the
    # windowed cos/sin basis vectors, stride is the hop.  This maps straight
    # onto the MXU; an index-array gather here is pathologically slow on TPU.
    # compute_dtype=bfloat16 halves the MXU time with f32 accumulation
    # (~1e-3 relative spectrogram error; ~0.01 dB after the log).
    cos_m, sin_m = _dft_matrices(frame_length, n_fft, window)
    n_bins = cos_m.shape[1]
    kernel = jnp.asarray(
        np.concatenate([cos_m.T, sin_m.T], axis=0)[:, None, :]
    )  # (2*n_bins, 1, frame_length)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        kernel,
        window_strides=(hop_length,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # (B, 2*n_bins, n_frames)
    re = out[:, :n_bins, :]
    im = out[:, n_bins:, :]
    sq = jnp.transpose(re * re + im * im, (0, 2, 1))
    if power == 2.0:
        return sq
    return jnp.sqrt(jnp.maximum(sq, 1e-30)) ** power


def log_mel_spectrogram(
    audio,
    sampling_rate: int,
    frame_length: int,
    hop_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    n_fft: int | None = None,
    center: bool = True,
    power: float = 2.0,
    mel_norm: str | None = "slaney",
    mel_scale: str = "slaney",
    triangle_domain: str = "hz",
    zero_dc: bool = False,
    log_mode: str = "db",
    log_offset: float = 0.01,
    compute_dtype=None,
):
    """audio (B, n) -> log-mel (B, n_frames, n_mels) float32.

    log_mode:
      - "db": 10*log10(max(mel, 1e-10))  (torchlibrosa LogmelFilterBank /
        HF power_to_db with ref=1, top_db=None) — CLAP convention
      - "natural": log(mel + log_offset) — VGGish convention
    """
    spec = stft_power(
        audio,
        frame_length=frame_length,
        hop_length=hop_length,
        n_fft=n_fft,
        center=center,
        power=power,
        compute_dtype=compute_dtype,
    )
    fb = mel_filter_bank(
        num_frequency_bins=spec.shape[-1],
        num_mel_filters=n_mels,
        min_frequency=float(fmin),
        max_frequency=float(fmax),
        sampling_rate=int(sampling_rate),
        norm=mel_norm,
        mel_scale=mel_scale,
        triangle_domain=triangle_domain,
        zero_dc=zero_dc,
    ).astype(np.float32)
    mel = jnp.einsum(
        "btk,km->btm", spec, jnp.asarray(fb), preferred_element_type=jnp.float32
    )
    if log_mode == "db":
        return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    if log_mode == "natural":
        return jnp.log(mel + log_offset)
    raise ValueError(f"unknown log_mode {log_mode!r}")
