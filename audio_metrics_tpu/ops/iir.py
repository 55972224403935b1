"""Batched IIR (biquad cascade) filtering.

Replaces the reference's ``scipy.signal.lfilter`` K-weighting pass
(mix_functions.py:109-111,193-196).  An IIR is a sequential recurrence, which
on TPU is expressed as a ``lax.scan`` over time carrying the direct-form-II
state, *batched over all signals in the window batch* so each scan step is a
full VPU vector op.  ``unroll`` amortizes loop dispatch overhead.

Filtering runs in float64 (the reference filters in f64 too): the BS.1770
high-pass biquad has poles close to the unit circle, where f32 recursion
noticeably drifts over 5 s x 48 kHz windows.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["biquad_cascade", "k_weighting_coeffs", "cascade_impulse_response"]


@partial(jax.jit, static_argnames=("unroll",))
def _biquad_cascade_scan(x, b, a, unroll: int = 32):
    """Apply a cascade of normalized biquads along the last axis.

    x: (B, n) float64; b, a: (n_stages, 3) with a[:, 0] == 1.
    Direct form II transposed:
        y[t]  = b0 x[t] + z1
        z1'   = b1 x[t] - a1 y[t] + z2
        z2'   = b2 x[t] - a2 y[t]
    """
    n_stages = b.shape[0]
    batch = x.shape[0]
    z = jnp.zeros((n_stages, 2, batch), dtype=x.dtype)

    def step(z, x_t):
        out = x_t
        new_z = []
        for s in range(n_stages):
            b0, b1, b2 = b[s, 0], b[s, 1], b[s, 2]
            a1, a2 = a[s, 1], a[s, 2]
            y = b0 * out + z[s, 0]
            z1 = b1 * out - a1 * y + z[s, 1]
            z2 = b2 * out - a2 * y
            new_z.append(jnp.stack([z1, z2]))
            out = y
        return jnp.stack(new_z), out

    z, y = jax.lax.scan(step, z, x.T, unroll=unroll)
    return y.T


def biquad_cascade(x, b, a, dtype=jnp.float64):
    """x: (B, n) or (n,); b, a: (n_stages, 3) biquad coefficient rows."""
    x = jnp.asarray(x, dtype=dtype)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    b = jnp.asarray(b, dtype=dtype)
    a = jnp.asarray(a, dtype=dtype)
    b = b / a[:, :1]
    a = a / a[:, :1]
    y = _biquad_cascade_scan(x, b, a)
    return y[0] if squeeze else y


def _high_shelf(g_db: float, q: float, fc: float, rate: float):
    """RBJ cookbook high-shelf biquad (ITU-R BS.1770 pre-filter)."""
    a_lin = 10.0 ** (g_db / 40.0)
    w0 = 2.0 * np.pi * fc / rate
    alpha = np.sin(w0) / (2.0 * q)
    cos_w0 = np.cos(w0)
    sqrt_a = np.sqrt(a_lin)
    b0 = a_lin * ((a_lin + 1) + (a_lin - 1) * cos_w0 + 2 * sqrt_a * alpha)
    b1 = -2 * a_lin * ((a_lin - 1) + (a_lin + 1) * cos_w0)
    b2 = a_lin * ((a_lin + 1) + (a_lin - 1) * cos_w0 - 2 * sqrt_a * alpha)
    a0 = (a_lin + 1) - (a_lin - 1) * cos_w0 + 2 * sqrt_a * alpha
    a1 = 2 * ((a_lin - 1) - (a_lin + 1) * cos_w0)
    a2 = (a_lin + 1) - (a_lin - 1) * cos_w0 - 2 * sqrt_a * alpha
    return np.array([b0, b1, b2]), np.array([a0, a1, a2])


def _high_pass(q: float, fc: float, rate: float):
    """RBJ cookbook high-pass biquad (BS.1770 RLB weighting)."""
    w0 = 2.0 * np.pi * fc / rate
    alpha = np.sin(w0) / (2.0 * q)
    cos_w0 = np.cos(w0)
    b0 = (1 + cos_w0) / 2
    b1 = -(1 + cos_w0)
    b2 = (1 + cos_w0) / 2
    a0 = 1 + alpha
    a1 = -2 * cos_w0
    a2 = 1 - alpha
    return np.array([b0, b1, b2]), np.array([a0, a1, a2])


def k_weighting_coeffs(rate: float):
    """BS.1770 K-weighting: 4 dB shelf at 1500 Hz (Q=1/sqrt 2) + 38 Hz
    high-pass (Q=0.5), recomputed for any sample rate like pyloudnorm's
    K-weighting filter class (used by the reference via pyln.Meter,
    mix_functions.py:69-71)."""
    b1, a1 = _high_shelf(4.0, 1.0 / np.sqrt(2.0), 1500.0, rate)
    b2, a2 = _high_pass(0.5, 38.0, rate)
    return np.stack([b1, b2]), np.stack([a1, a2])


@lru_cache(maxsize=None)
def cascade_impulse_response(rate: float, n_taps: int = 4096) -> "np.ndarray":
    """Truncated impulse response of the K-weighting cascade (host, cached).

    The cascade's slowest pole (38 Hz high-pass, Q=0.5) has radius ~1-w0/2,
    so the IR decays below ~1e-4 within a few thousand samples at 48 kHz —
    a truncated-IR convolution (MXU matmul) reproduces the zero-state IIR
    output to ~1e-4 absolute, which is ~0.001 dB of loudness: far below any
    gating threshold sensitivity.  Computed with a plain numpy recursion.
    """
    b, a = k_weighting_coeffs(rate)
    x = np.zeros(n_taps)
    x[0] = 1.0
    for s in range(b.shape[0]):
        b0, b1, b2 = b[s] / a[s, 0]
        a1, a2 = a[s, 1] / a[s, 0], a[s, 2] / a[s, 0]
        y = np.empty_like(x)
        z1 = z2 = 0.0
        for i in range(n_taps):
            y[i] = b0 * x[i] + z1
            z1 = b1 * x[i] - a1 * y[i] + z2
            z2 = b2 * x[i] - a2 * y[i]
        x = y
    return x
