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

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .attention import _dot_precision

__all__ = [
    "mel_filter_bank",
    "log_mel_spectrogram",
    "log_mel_pallas",
    "log_mel_pallas_halo",
    "stft_power",
]

# Kernel-selection flags participate in traced programs but are not part of
# the jit cache key — read them ONCE at import; toggling later is a no-op.
_MEL_V1 = bool(os.environ.get("AM_TPU_MEL_V1"))


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

    # Framing + windowed DFT as plain MXU matmuls.  Overlapping frames
    # (hop < frame) are decomposed into ceil(frame/hop) NON-overlapping
    # hop-strided chunk views (pure reshapes), each contracted against its
    # chunk of the windowed cos/sin basis and summed:
    #   S[t] = sum_k x[t*hop + k*hop : ...] @ W[k*hop : ...]
    # A strided 1-channel convolution here runs ~6x slower (XLA's general
    # conv path, measured 9.4 ms vs 1.6 ms for B=64 10 s clips at 48 kHz);
    # an index-array gather is pathologically slow on TPU.
    cos_m, sin_m = _dft_matrices(frame_length, n_fft, window)
    n_bins = cos_m.shape[1]
    basis = np.concatenate([cos_m, sin_m], axis=1)  # (frame_length, 2*n_bins)
    n_frames = (x.shape[1] - frame_length) // hop_length + 1
    n_chunks = -(-frame_length // hop_length)
    # row stride of the chunk views is hop_length: pad so the last view fits
    need = (n_chunks - 1) * hop_length + n_frames * hop_length
    if need > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    dt = compute_dtype if compute_dtype is not None else jnp.float32
    acc = None
    for k in range(n_chunks):
        off = k * hop_length
        length = min(hop_length, frame_length - off)
        xk = x[:, off : off + n_frames * hop_length]
        xk = xk.reshape(x.shape[0], n_frames, hop_length)[:, :, :length]
        wk = jnp.asarray(basis[off : off + length].astype(np.float32))
        part = jnp.dot(
            xk.astype(dt), wk.astype(dt), preferred_element_type=jnp.float32
        )
        acc = part if acc is None else acc + part
    re = acc[:, :, :n_bins]
    im = acc[:, :, n_bins:]
    sq = re * re + im * im
    if power == 2.0:
        return sq
    return jnp.sqrt(jnp.maximum(sq, 1e-30)) ** power


def _fb_support_bins(fb: np.ndarray) -> int:
    """Highest frequency bin with any mel-filter weight, rounded up to a
    lane multiple — bins above fmax contribute nothing and can be dropped
    from the DFT basis."""
    nz = np.nonzero(np.any(fb != 0.0, axis=1))[0]
    hi = int(nz[-1]) + 1 if len(nz) else fb.shape[0]
    return min(fb.shape[0], -(-hi // 128) * 128)


def log_mel_pallas(
    audio,
    *,
    frame_length: int,
    hop_length: int,
    n_fft: int,
    fb: np.ndarray,
    window: str = "hann",
    center: bool = True,
    log_mode: str = "db",
    log_offset: float = 0.01,
    out_affine=None,
    out_dtype=None,
    interpret: bool = False,
):
    """Fused log-mel frontend: framing -> windowed DFT -> power -> mel
    projection -> log in one Pallas kernel (bf16 DFT matmul, f32 power/mel).
    ``out_affine``/``out_dtype``: optional per-mel-bin affine epilogue and
    output dtype (see log_mel_pallas_halo).

    XLA computes the same chain at f32 matmul rate regardless of casts
    (``--xla_allow_excess_precision`` folds bf16 downcasts away) and
    round-trips the (B, frames, 2*n_bins) DFT output through HBM; here the
    spectrum exists only in VMEM and the DFT basis is truncated to the mel
    filterbank's support (fmax).  Used by the embedders on TPU; stft_power/
    log_mel_spectrogram remain the reference XLA path (and the parity oracle).
    """
    import contextlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(audio, dtype=jnp.float32)
    b = x.shape[0]
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (x.shape[1] - frame_length) // hop_length + 1
    n_chunks = -(-frame_length // hop_length)
    width = n_chunks * hop_length  # chunk-padded frame length
    need = (n_chunks - 1) * hop_length + n_frames * hop_length
    if need > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))

    cos_m, sin_m = _dft_matrices(frame_length, n_fft, window)
    n_bins_keep = _fb_support_bins(fb)
    basis = np.zeros((width, 2 * n_bins_keep), np.float32)
    basis[:frame_length, :n_bins_keep] = cos_m[:, :n_bins_keep]
    basis[:frame_length, n_bins_keep:] = sin_m[:, :n_bins_keep]
    fb_t = np.ascontiguousarray(fb[:n_bins_keep].astype(np.float32))
    n_mels = fb_t.shape[1]

    # contiguous frames: concat n_chunks hop-strided views (the only
    # materialized intermediate, in bf16)
    xr = x.reshape(b, -1, hop_length)
    frames = jnp.concatenate(
        [xr[:, k : k + n_frames] for k in range(n_chunks)], axis=2
    ).astype(jnp.bfloat16)
    rows = b * n_frames
    frames = frames.reshape(rows, width)

    t = 1024 if rows >= 1024 else max(8, 1 << (rows - 1).bit_length())
    pad_rows = (-rows) % t
    if pad_rows:
        frames = jnp.pad(frames, ((0, pad_rows), (0, 0)))

    if log_mode == "db":
        def logf(m):
            return jnp.float32(10.0) * (
                jnp.log(jnp.maximum(m, jnp.float32(1e-10)))
                * jnp.float32(0.43429448190325176)
            )
    elif log_mode == "natural":
        def logf(m):
            return jnp.log(m + jnp.float32(log_offset))
    else:
        raise ValueError(f"unknown log_mode {log_mode!r}")

    odt = jnp.float32 if out_dtype is None else out_dtype

    def kernel(fr_ref, basis_ref, fb_ref, *rest):
        if out_affine is not None:
            sc_ref, of_ref, out_ref = rest
        else:
            (out_ref,) = rest
        fr = fr_ref[:]
        bs = basis_ref[:]
        p = jnp.dot(
            fr,
            bs,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(fr, bs),
        )
        re = p[:, :n_bins_keep]
        im = p[:, n_bins_keep:]
        sq = re * re + im * im
        mel = jnp.dot(sq, fb_ref[:], preferred_element_type=jnp.float32)
        lm = logf(mel)
        if out_affine is not None:
            lm = lm * sc_ref[:] + of_ref[:]
        out_ref[:] = lm.astype(odt)

    ins = [frames, jnp.asarray(basis), jnp.asarray(fb_t)]
    in_specs = [
        pl.BlockSpec((t, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (width, 2 * n_bins_keep),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_bins_keep, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if out_affine is not None:
        sc, of = out_affine
        aff_spec = pl.BlockSpec(
            (1, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        ins += [
            jnp.asarray(sc, jnp.float32).reshape(1, n_mels),
            jnp.asarray(of, jnp.float32).reshape(1, n_mels),
        ]
        in_specs += [aff_spec, aff_spec]

    if hasattr(jax, "enable_x64"):
        scope = jax.enable_x64(False)
    else:  # pragma: no cover
        scope = contextlib.nullcontext()
    with scope:
        out = pl.pallas_call(
            kernel,
            grid=(frames.shape[0] // t,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((t, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((frames.shape[0], n_mels), odt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*ins)
    return out[:rows].reshape(b, n_frames, n_mels)


def log_mel_pallas_halo(
    audio,
    *,
    frame_length: int,
    hop_length: int,
    n_fft: int,
    fb: np.ndarray,
    window: str = "hann",
    center: bool = True,
    log_mode: str = "db",
    log_offset: float = 0.01,
    tile_frames: int = 512,
    basis_dtype=jnp.bfloat16,
    out_affine=None,
    out_dtype=None,
    interpret: bool = False,
):
    """Halo-DMA log-mel frontend: framing happens INSIDE the kernel.

    ``out_affine``: optional per-mel-bin (scale, offset) pair applied to the
    log-mel as a kernel epilogue (out = logmel * scale + offset) — the CLAP
    path folds its eval-mode BatchNorm here so the (B, frames, mels) tensor
    never takes a separate elementwise pass (reference: ClapAudioEncoder's
    bn0 over the mel bins).  ``out_dtype``: output dtype (default f32); the
    bf16-compute forward asks for bf16 directly, halving the mel HBM
    round-trip — bitwise-identical downstream because the consumer (the
    bicubic time-interp matmul) casts to bf16 anyway.

    log_mel_pallas materializes the overlapped (rows, frame) matrix in HBM
    (~184 MB for 64x 10 s clips at 48 kHz) before the kernel reads it back;
    here the kernel manually DMAs the ceil(frame/hop) hop-strided chunk views
    of each frame tile straight from the (B, n_hops, hop) audio in HBM into
    VMEM scratch and contracts each against its chunk of the DFT basis — the
    overlap never exists in HBM.  The DFT basis is bf16 by default, which
    moves the dominant matmul from the f32 to the bf16 MXU rate (the frames
    were already bf16; both quantizations are ~0.4 % relative, well under
    the mel-noise floor that matters to the embedders — see
    tests/test_pallas_model_kernels.py tolerances).
    """
    import contextlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(audio, dtype=jnp.float32)
    b = x.shape[0]
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (x.shape[1] - frame_length) // hop_length + 1
    n_chunks = -(-frame_length // hop_length)

    t_frames = min(tile_frames, max(16, 1 << (n_frames - 1).bit_length()))
    n_tiles = -(-n_frames // t_frames)
    n_frames_pad = n_tiles * t_frames
    # Mosaic HBM DMA slices must be tile-aligned: hop rows pad to a lane
    # multiple (the matching basis rows are zero so pad samples contribute
    # nothing), and the per-tile halo copy starts at ti*t_frames (a sublane
    # tile multiple) and spans t_frames + halo_hops rows in one DMA; the
    # +k chunk offsets become in-VMEM sublane slices.
    halo_hops = 16
    assert t_frames % 16 == 0 and n_chunks - 1 <= halo_hops
    need = (n_frames_pad + halo_hops) * hop_length
    if need > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]
    hop_pad = -(-hop_length // 128) * 128
    xr = x.astype(jnp.bfloat16).reshape(b, n_frames_pad + halo_hops, hop_length)
    if hop_pad != hop_length:
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, hop_pad - hop_length)))

    cos_m, sin_m = _dft_matrices(frame_length, n_fft, window)
    n_bins_keep = _fb_support_bins(fb)
    basis = np.zeros((n_chunks, hop_pad, 2 * n_bins_keep), np.float32)
    for k in range(n_chunks):
        lo = k * hop_length
        ln = min(hop_length, frame_length - lo)
        basis[k, :ln, :n_bins_keep] = cos_m[lo : lo + ln, :n_bins_keep]
        basis[k, :ln, n_bins_keep:] = sin_m[lo : lo + ln, :n_bins_keep]
    fb_t = np.ascontiguousarray(fb[:n_bins_keep].astype(np.float32))
    n_mels = fb_t.shape[1]

    if log_mode == "db":
        def logf(m):
            return jnp.float32(10.0) * (
                jnp.log(jnp.maximum(m, jnp.float32(1e-10)))
                * jnp.float32(0.43429448190325176)
            )
    elif log_mode == "natural":
        def logf(m):
            return jnp.log(m + jnp.float32(log_offset))
    else:
        raise ValueError(f"unknown log_mode {log_mode!r}")

    n_steps = b * n_tiles
    odt = jnp.float32 if out_dtype is None else out_dtype

    def kernel(xr_ref, basis_ref, fb_ref, *rest):
        if out_affine is not None:
            sc_ref, of_ref, out_ref, hops, sem = rest
        else:
            out_ref, hops, sem = rest
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        step = bi * n_tiles + ti
        slot = jax.lax.rem(step, 2)

        def copy_for(s, sl):
            return pltpu.make_async_copy(
                xr_ref.at[
                    s // n_tiles,
                    pl.ds(jax.lax.rem(s, n_tiles) * t_frames, t_frames + halo_hops),
                    :,
                ],
                hops.at[sl],
                sem.at[sl],
            )

        # double buffer: this step's copy was started by the previous step
        # (the first step starts its own), and the next step's copy overlaps
        # with this step's matmuls
        @pl.when(step == 0)
        def _():
            copy_for(step, slot).start()

        @pl.when(step + 1 < n_steps)
        def _():
            copy_for(step + 1, jax.lax.rem(step + 1, 2)).start()

        copy_for(step, slot).wait()
        acc = None
        for k in range(n_chunks):
            lhs = hops[slot, k : k + t_frames]
            rhs = basis_ref[k].astype(basis_dtype)
            part = jnp.dot(
                lhs,
                rhs,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(lhs, rhs),
            )
            acc = part if acc is None else acc + part
        re = acc[:, :n_bins_keep]
        im = acc[:, n_bins_keep:]
        sq = re * re + im * im
        mel = jnp.dot(sq, fb_ref[:], preferred_element_type=jnp.float32)
        lm = logf(mel)
        if out_affine is not None:
            lm = lm * sc_ref[0] + of_ref[0]
        out_ref[0] = lm.astype(odt)

    ins = [xr, jnp.asarray(basis), jnp.asarray(fb_t)]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (n_chunks, hop_pad, 2 * n_bins_keep),
            lambda bi, ti: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_bins_keep, n_mels),
            lambda bi, ti: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if out_affine is not None:
        sc, of = out_affine
        aff_spec = pl.BlockSpec(
            (1, n_mels), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM
        )
        ins += [
            jnp.asarray(sc, jnp.float32).reshape(1, n_mels),
            jnp.asarray(of, jnp.float32).reshape(1, n_mels),
        ]
        in_specs += [aff_spec, aff_spec]

    if hasattr(jax, "enable_x64"):
        scope = jax.enable_x64(False)
    else:  # pragma: no cover
        scope = contextlib.nullcontext()
    with scope:
        out = pl.pallas_call(
            kernel,
            grid=(b, n_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, t_frames, n_mels), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_frames_pad, n_mels), odt),
            scratch_shapes=[
                pltpu.VMEM((2, t_frames + halo_hops, hop_pad), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*ins)
    return out[:, :n_frames]


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
    out_affine=None,
    out_dtype=None,
):
    """audio (B, n) -> log-mel (B, n_frames, n_mels) float32.

    ``out_affine``: optional (scale, offset) per-mel-bin affine applied to
    the log-mel (out = logmel * scale + offset) — on the Pallas path it runs
    as a kernel epilogue, on the XLA path as a fused elementwise op.
    ``out_dtype``: output dtype override (default float32).

    log_mode:
      - "db": 10*log10(max(mel, 1e-10))  (torchlibrosa LogmelFilterBank /
        HF power_to_db with ref=1, top_db=None) — CLAP convention
      - "natural": log(mel + log_offset) — VGGish convention

    With ``compute_dtype=bfloat16`` on the TPU backend (and power=2), the
    whole chain dispatches to the fused halo-DMA Pallas kernel
    (log_mel_pallas_halo; AM_TPU_MEL_V1=1 selects the older materializing
    kernel) — XLA otherwise folds the bf16 casts away
    (--xla_allow_excess_precision) and runs the DFT at f32 matmul rate with
    HBM round-trips between stages.
    """
    fb_np = mel_filter_bank(
        num_frequency_bins=(n_fft or frame_length) // 2 + 1,
        num_mel_filters=n_mels,
        min_frequency=float(fmin),
        max_frequency=float(fmax),
        sampling_rate=int(sampling_rate),
        norm=mel_norm,
        mel_scale=mel_scale,
        triangle_domain=triangle_domain,
        zero_dc=zero_dc,
    ).astype(np.float32)
    if (
        compute_dtype is not None
        and jnp.dtype(compute_dtype) == jnp.bfloat16
        and power == 2.0
        and jax.default_backend() == "tpu"
        and not os.environ.get("AM_TPU_NO_PALLAS")
    ):
        fn = log_mel_pallas if _MEL_V1 else log_mel_pallas_halo
        return fn(
            audio,
            frame_length=frame_length,
            hop_length=hop_length,
            n_fft=n_fft or frame_length,
            fb=fb_np,
            center=center,
            log_mode=log_mode,
            log_offset=log_offset,
            out_affine=out_affine,
            out_dtype=out_dtype,
        )
    spec = stft_power(
        audio,
        frame_length=frame_length,
        hop_length=hop_length,
        n_fft=n_fft,
        center=center,
        power=power,
        compute_dtype=compute_dtype,
    )
    mel = jnp.einsum(
        "btk,km->btm", spec, jnp.asarray(fb_np), preferred_element_type=jnp.float32
    )
    if log_mode == "db":
        lm = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    elif log_mode == "natural":
        lm = jnp.log(mel + log_offset)
    else:
        raise ValueError(f"unknown log_mode {log_mode!r}")
    if out_affine is not None:
        sc, of = out_affine
        lm = lm * jnp.asarray(sc, jnp.float32) + jnp.asarray(of, jnp.float32)
    if out_dtype is not None:
        lm = lm.astype(out_dtype)
    return lm
