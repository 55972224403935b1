"""Context+stem mixing functions.

Counterpart of reference src/audio_metrics/mix_functions.py:209-344, which
mixes one window at a time on 64 CPU threads (loudness metering via numba +
scipy lfilter).  Here each mix function is a *batched* jitted program over
``(B, n_samples, 2)`` windows: loudness metering, gain staging, summing,
normalization and limiting all happen on device in one pass over the batch.

Registry parity (mix_functions.py:335-344): ``PP`` peak-preserve, ``P0/P1/P2``
peak-normalize (stem reduction 0/-3/-6 dB, out -3 dB), ``L0/L1/L2``
loudness-based (stem reduction 0/-3/-6 dB relative to context, out -20 LUFS,
brick-wall limited if the peak exceeds 1.0).  Default: ``L0``.

Every function accepts either one window ``(n, 2)`` (reference per-item
protocol) or a batch ``(B, n, 2)`` and carries ``is_batched_mix = True`` so
the pipeline feeds whole batches.
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp

from .limiter import limit_batch
from .loudness import integrated_loudness_batch

__all__ = [
    "mix_tracks_peak_preserve",
    "mix_tracks_peak_normalize",
    "mix_tracks_loudness",
    "MIX_FUNCTIONS",
    "DEFAULT_MIX_FUNCTION",
    "emit_mix_diagnostics",
]

_EPS = 1e-5


def _batched(fn):
    """Accept (n, 2) or (B, n, 2); mark as batch-capable for the pipeline.

    ``diag``: optional list collecting per-batch diagnostic flag pytrees
    (device arrays, NOT fetched here — ``emit_mix_diagnostics`` does one
    deferred fetch per eval so the device pipeline never syncs mid-stream).
    With ``diag=None`` (direct per-window use, reference protocol) the
    warnings fire immediately, matching mix_functions.py:293-299.
    """

    def wrapper(audio, sr=None, diag=None, **kwargs):
        x = jnp.asarray(audio, dtype=jnp.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        if x.ndim != 3:
            raise ValueError(f"audio must be (n, ch) or (batch, n, ch), got {x.shape}")
        out = fn(x, sr=sr, **kwargs)
        if isinstance(out, tuple):
            out, flags = out
            if diag is not None:
                diag.append(flags)
            else:
                emit_mix_diagnostics([flags])
        return out[0] if single else out

    wrapper.is_batched_mix = True
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


def emit_mix_diagnostics(diag) -> None:
    """Fetch accumulated mix flags ONCE and surface the reference's audio
    warnings (mix_functions.py:270,293-299): silent channels and
    peak-gain reduction.  Aggregated over all windows of a run."""
    if not diag:
        return
    import numpy as _np

    flags = jax.device_get(diag)
    n_both = n_one = 0
    peaks = []
    for f in flags:
        valid = _np.asarray(f.get("valid", True)).astype(bool)
        n_both += int((_np.asarray(f["both_silent"]) & valid).sum())
        n_one += int((_np.asarray(f["one_silent"]) & valid).sum())
        p = _np.atleast_1d(_np.asarray(f["peak"]))
        peaks.append(_np.where(valid, p, 0.0))
    peaks = _np.concatenate(peaks)
    n_lim = int((peaks > 1.0).sum())
    if n_both:
        warnings.warn(f"Both channels silent ({n_both} of {peaks.size} windows)")
    if n_one:
        warnings.warn(f"One channel silent ({n_one} of {peaks.size} windows)")
    if n_lim:
        warnings.warn(
            f"Reducing gain (peak amp: {peaks.max():.2f}; "
            f"{n_lim} of {peaks.size} windows limited)"
        )


# ----------------------------------------------------------------------
# peak-based mixes
# ----------------------------------------------------------------------
@_batched
def mix_tracks_peak_preserve(audio, sr=None):
    """Mean of channels, normalized back to the original peak amplitude
    (mix_functions.py:209-227).  Silent inputs pass through channel 0."""
    del sr
    if audio.shape[2] == 1:
        return audio[:, :, 0]
    vmax_orig = jnp.max(jnp.abs(audio), axis=(1, 2))
    mix = jnp.mean(audio, axis=2)
    vmax_new = jnp.max(jnp.abs(mix), axis=1)
    gain = vmax_orig / jnp.maximum(vmax_new, 1e-30)
    mixed = mix * gain[:, None]
    return jnp.where((vmax_orig <= _EPS)[:, None], audio[:, :, 0], mixed)


@_batched
def mix_tracks_peak_normalize(audio, sr=None, stem_db_red=0.0, out_db=0.0):
    """Per-channel peak normalize (stem reduced by ``stem_db_red``), sum,
    peak-normalize the mix to ``out_db`` (mix_functions.py:230-249)."""
    del sr
    out_gain = 10.0 ** (out_db / 20.0)
    stem_gain = 10.0 ** (stem_db_red / 20.0)
    if audio.shape[2] == 1:
        mix = audio[:, :, 0]
    else:
        peaks = jnp.max(jnp.abs(audio), axis=1, keepdims=True)  # (B, 1, C)
        peaks = peaks.at[:, :, 1].multiply(stem_gain)
        mix = jnp.sum(audio / jnp.maximum(peaks, 1e-30), axis=2)
    peak = jnp.max(jnp.abs(mix), axis=1, keepdims=True)
    return mix * (out_gain / jnp.maximum(peak, 1e-30))


# ----------------------------------------------------------------------
# loudness-based mix (the default family)
# ----------------------------------------------------------------------
def _db_gain(delta_db):
    return 10.0 ** (delta_db / 20.0)


@partial(jax.jit, static_argnames=("sr",))
def _mix_loudness_jit(audio, sr: int, stem_db_red: float, out_db: float):
    s0 = audio[:, :, 0].astype(jnp.float32)
    s1 = audio[:, :, 1].astype(jnp.float32)

    vmax = jnp.max(jnp.abs(audio), axis=1)  # (B, 2)
    silent = vmax < _EPS  # (B, 2)
    both_silent = jnp.all(silent, axis=1)
    one_silent = jnp.logical_and(jnp.any(silent, axis=1), ~both_silent)

    # loudness of both channels in one metering pass
    l01 = integrated_loudness_batch(
        jnp.stack([s0, s1], axis=0).reshape(-1, audio.shape[1]), sr
    ).reshape(2, -1)
    l0, l1 = l01[0], l01[1]

    # set stem loudness relative to context (pyln.normalize.loudness gain)
    l1_trg = l0 + stem_db_red
    gain_ok = jnp.logical_and(jnp.isfinite(l1), jnp.isfinite(l1_trg))
    # gains derive from f64 loudness scalars; the signals stay f32
    s1_gain = jnp.where(gain_ok, _db_gain(l1_trg - l1), 1.0).astype(jnp.float32)
    mix = s0 + s1 * s1_gain[:, None]

    # when exactly one channel is silent, the mix is the non-silent channel
    nonsilent = jnp.where(silent[:, 0:1], s1, s0)
    mix = jnp.where(one_silent[:, None], nonsilent, mix)

    # normalize the mix to the target output loudness
    l_mix = integrated_loudness_batch(mix, sr)
    norm_ok = jnp.isfinite(l_mix)
    norm_gain = jnp.where(norm_ok, _db_gain(out_db - l_mix), 1.0).astype(jnp.float32)
    mix = mix * norm_gain[:, None]

    # brick-wall limit items whose peak exceeds 1.0; the sequential limiter
    # scan only runs at all if some item actually peaks (lax.cond)
    peak = jnp.max(jnp.abs(mix), axis=1)
    mix32 = mix.astype(jnp.float32)

    def _with_limiter(m):
        return jnp.where((peak > 1.0)[:, None], limit_batch(m), m)

    mix32 = jax.lax.cond(
        jnp.any(peak > 1.0), _with_limiter, lambda m: m, mix32
    )

    # both channels silent: pass channel 0 through untouched
    out = jnp.where(both_silent[:, None], audio[:, :, 0], mix32)
    flags = {"both_silent": both_silent, "one_silent": one_silent, "peak": peak}
    return out, flags


@_batched
def mix_tracks_loudness(audio, sr=None, stem_db_red=-4.0, out_db=-20.0):
    """Mix with a fixed loudness relationship (mix_functions.py:281-332):
    measure BS.1770 loudness of context and stem, set the stem
    ``stem_db_red`` dB below the context, sum, normalize the mix to
    ``out_db`` LUFS, brick-wall limit if the peak exceeds 1.0."""
    if sr is None:
        raise ValueError("mix_tracks_loudness requires sr")
    if audio.shape[2] == 1:
        return audio[:, :, 0]
    return _mix_loudness_jit(audio, int(sr), float(stem_db_red), float(out_db))


def mix_preserve_loudness(audio, sr=None):
    """Loudness-preserving sum (mix_functions.py:252-278; unused by the
    registry there, kept for completeness): sum channels, restore the louder
    channel's loudness, limit if peaking."""
    x = jnp.asarray(audio, dtype=jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    s0 = x[:, :, 0].astype(jnp.float64)
    s1 = x[:, :, 1].astype(jnp.float64)
    s2 = s0 + s1
    sr = int(sr)
    l_all = integrated_loudness_batch(
        jnp.concatenate([s0, s1, s2], axis=0), sr
    ).reshape(3, -1)
    l_trg = jnp.maximum(l_all[0], l_all[1])
    ok = jnp.logical_and(jnp.isfinite(l_trg), jnp.isfinite(l_all[2]))
    s2 = s2 * jnp.where(ok, _db_gain(l_trg - l_all[2]), 1.0)[:, None]
    peak = jnp.max(jnp.abs(s2), axis=1)
    if bool(jnp.any(peak > 1.0)):
        warnings.warn(f"Reducing gain (peak amp: {float(jnp.max(peak)):.2f})")
    out = s2.astype(jnp.float32)
    limited = limit_batch(out)
    out = jnp.where((peak > 1.0)[:, None], limited, out)
    return out[0] if squeeze else out


mix_preserve_loudness.is_batched_mix = True


MIX_FUNCTIONS = dict(
    PP=mix_tracks_peak_preserve,
    P0=partial(mix_tracks_peak_normalize, stem_db_red=-0, out_db=-3),
    P1=partial(mix_tracks_peak_normalize, stem_db_red=-3, out_db=-3),
    P2=partial(mix_tracks_peak_normalize, stem_db_red=-6, out_db=-3),
    L0=partial(mix_tracks_loudness, stem_db_red=0, out_db=-20),
    L1=partial(mix_tracks_loudness, stem_db_red=-3, out_db=-20),
    L2=partial(mix_tracks_loudness, stem_db_red=-6, out_db=-20),
)
DEFAULT_MIX_FUNCTION = "L0"

# partial() hides function attributes; re-mark registry entries
for _name, _fn in MIX_FUNCTIONS.items():
    if not hasattr(_fn, "is_batched_mix"):
        _fn.is_batched_mix = True
