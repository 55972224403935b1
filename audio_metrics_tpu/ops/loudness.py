"""ITU-R BS.1770-4 integrated loudness, batched on TPU.

Replaces the reference's pyloudnorm ``Meter`` + numba gating kernel
(mix_functions.py:12-66,69-206): the K-weighting IIR runs as a batched
``lax.scan`` (ops/iir.py), and the 400 ms / 75 %-overlap gating becomes a
two-level framed reduction (stride-sized sub-block sums + a length-4 sliding
sum), entirely vectorized over blocks *and* over the window batch — no
per-signal Python, no GIL games, one jitted program for the whole batch.

Semantics match the spec (and pyloudnorm): per-block mean square of the
filtered signal, absolute gate at -70 LKFS, relative gate at (ungated mean
- 10 LU), loudness = -0.691 + 10 log10(sum_c G_c z_c).
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp

from .iir import (
    _k_weighting_parallel,
    _k_weighting_sections,
    biquad_cascade,
    cascade_impulse_response,
    k_weighting_coeffs,
    lfilter_blocked,
)

__all__ = ["integrated_loudness_batch", "k_weighted", "Meter", "CHANNEL_GAINS"]

# channel gains [L, R, C, Ls, Rs] (BS.1770 table; mix_functions.py:71)
CHANNEL_GAINS = np.array([1.0, 1.0, 1.0, 1.41, 1.41])

_ABS_THRESHOLD = -70.0  # LKFS absolute gate


def k_weighted(x, sr: int, method: str = "blocked"):
    """Apply the K-weighting filter cascade.  x: (B, n) -> (B, n).

    method="blocked" (default): the exact IIR recurrence as cascaded
    low-transient sections, each restructured as lower-triangular MXU
    matmuls per chunk with a short boundary-state convolution
    (ops/iir.lfilter_blocked) — no scan, no FFT, no IR truncation; ~1e-4
    rel signal err (f32), <2e-5 LUFS.
    method="blocked-parallel": the same machinery in partial-fraction
    (parallel) form — ~20x more f32-accurate (5.7e-6 rel; each section's
    rounding enters the output once) but measurably slower on v5e (the
    parallel section outputs cannot share the cascade's fused chain:
    k_weighted 12.3 -> 14.0 ms per 192x 5s).
    method="fir": FFT convolution with the truncated (4096-tap) impulse
    response of the cascade, matching the exact IIR to ~1e-5 (a direct
    stride-1 conv lowers poorly on TPU, ~10x slower than the FFT).
    method="scan": the exact sequential biquad recurrence in float64 (a
    48 kHz x 5 s window means a 240k-step scan; kept for verification).
    """
    if method == "scan":
        b, a = k_weighting_coeffs(float(sr))
        return biquad_cascade(x, b, a)
    if method == "blocked":
        y = jnp.asarray(x, jnp.float32)
        for b, a in _k_weighting_sections(float(sr)):
            y = lfilter_blocked(b, a, y)
        return y
    if method == "blocked-parallel":
        xf = jnp.asarray(x, jnp.float32)
        k0, sections = _k_weighting_parallel(float(sr))
        y = xf * jnp.float32(k0)
        for b, a in sections:
            y = y + lfilter_blocked(b, a, xf)
        return y
    ir = cascade_impulse_response(float(sr)).astype(np.float32)
    xf = jnp.asarray(x, dtype=jnp.float32)
    n = xf.shape[-1]
    nfft = 1 << (n + len(ir) - 1).bit_length()
    spec = jnp.fft.rfft(xf, nfft)
    h = jnp.fft.rfft(jnp.asarray(ir), nfft)
    out = jnp.fft.irfft(spec * h[None], nfft)
    return out[:, :n].astype(jnp.float32)


@jax.jit
def _gated_loudness(z):
    """BS.1770 two-stage gating over per-block mean-square powers.

    z: (B, C, n_blocks) per-block mean square of the K-weighted signal.
    """
    n_ch = z.shape[1]
    gains = jnp.asarray(CHANNEL_GAINS[:n_ch], dtype=z.dtype)
    weighted = jnp.einsum("c,bcn->bn", gains, z)
    l_blocks = -0.691 + 10.0 * jnp.log10(jnp.maximum(weighted, 1e-300))

    # absolute gate
    j_abs = l_blocks >= _ABS_THRESHOLD
    count_abs = jnp.sum(j_abs, axis=-1)
    z_abs = jnp.where(j_abs[:, None, :], z, 0.0).sum(axis=-1) / jnp.maximum(
        count_abs[:, None], 1
    )
    gamma_r = (
        -0.691
        + 10.0
        * jnp.log10(jnp.maximum(jnp.einsum("c,bc->b", gains, z_abs), 1e-300))
        - 10.0
    )

    # relative + absolute gate
    j_rel = jnp.logical_and(l_blocks > gamma_r[:, None], l_blocks > _ABS_THRESHOLD)
    count_rel = jnp.sum(j_rel, axis=-1)
    z_rel = jnp.where(j_rel[:, None, :], z, 0.0).sum(axis=-1) / jnp.maximum(
        count_rel[:, None], 1
    )
    lufs = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.einsum("c,bc->b", gains, z_rel), 1e-300)
    )
    neg_inf = jnp.asarray(-jnp.inf, dtype=lufs.dtype)
    lufs = jnp.where(count_abs == 0, neg_inf, lufs)
    lufs = jnp.where(count_rel == 0, neg_inf, lufs)
    return lufs


def integrated_loudness_batch(audio, sr: int, method: str = "blocked"):
    """Integrated gated loudness per item.

    audio: (B, n) mono or (B, n, C) multichannel -> (B,) LUFS (float64).
    Mirrors ``Meter.integrated_loudness_numba`` / ``integrated_loudness_fast``
    (mix_functions.py:73-206) for a whole batch in one program.  ``method``
    selects the K-weighting implementation (see :func:`k_weighted`); the
    "fir" path computes the gating in f32 (emulated f64 elementwise over
    B x n samples dominates mix time on TPU otherwise; the f32 gating error
    is ~1e-6 dB), while "scan" keeps full f64 for bit-level verification.
    """
    dtype = jnp.float64 if method == "scan" else jnp.float32
    x = jnp.asarray(audio, dtype=dtype)
    if x.ndim == 1:
        x = x[None, :, None]
    elif x.ndim == 2:
        x = x[:, :, None]
    b_sz, n, n_ch = x.shape

    block = int(0.4 * sr)
    stride = int(0.4 * 0.25 * sr)  # 75% overlap -> 100 ms step
    n_sub = n // stride
    if n_sub < 4:
        raise ValueError(
            f"audio too short for loudness gating: {n} samples < {block} "
            f"({sr} Hz, 400 ms blocks)"
        )

    # K-weight each channel (batched over B*C signals)
    flat = jnp.moveaxis(x, 2, 1).reshape(b_sz * n_ch, n)
    filtered = k_weighted(flat, sr, method=method)
    sq = filtered * filtered

    n_blocks = (n - block) // stride + 1
    if block == 4 * stride:
        # fast path: stride-sized sub-block means + length-4 sliding mean
        sub = sq[:, : n_sub * stride].reshape(b_sz * n_ch, n_sub, stride).mean(-1)
        z = (sub[:, 0:-3] + sub[:, 1:-2] + sub[:, 2:-1] + sub[:, 3:]) / 4.0
        z = z[:, :n_blocks]
    else:
        # general path (block not a multiple of stride): gather from cumsum
        cs = jnp.concatenate(
            [jnp.zeros((b_sz * n_ch, 1), sq.dtype), jnp.cumsum(sq, axis=1)], axis=1
        )
        starts = jnp.arange(n_blocks) * stride
        z = (cs[:, starts + block] - cs[:, starts]) / block

    z_power = z.reshape(b_sz, n_ch, -1)
    return _gated_loudness(z_power).astype(jnp.float64)


class Meter:
    """BS.1770 meter, API-compatible with the reference's pyloudnorm-based
    ``Meter`` (mix_functions.py:69-206): ``integrated_loudness``,
    ``integrated_loudness_fast`` and ``integrated_loudness_numba`` all map to
    the same batched device kernel here."""

    def __init__(self, rate: int):
        self.rate = int(rate)
        self.block_size = 0.400
        self.G = CHANNEL_GAINS

    def integrated_loudness(self, data) -> float:
        x = np.asarray(data, dtype=np.float64)
        return float(np.asarray(integrated_loudness_batch(x[None], self.rate))[0])

    # parity aliases (the reference's two optimized variants)
    integrated_loudness_fast = integrated_loudness
    integrated_loudness_numba = integrated_loudness
