"""Fused CLAP frontend: audio hops in, swin patch tokens out, one kernel.

The production CLAP path (reference embedders/clap.py:39 + laion_clap's
HTSAT forward) runs, per batch: log-mel DFT -> repeat-pad frame gather ->
BatchNorm -> bicubic time-interp -> patchify relayout -> patch-embed matmul
-> LayerNorm.  As separate XLA programs each stage round-trips its
(B, frames, bins) / (B, tokens, C) intermediate through HBM, and the
patchify is a 6-d transpose.  This kernel performs the WHOLE chain per clip
inside VMEM:

  1. one chunked DFT matmul over the head+tail frames of the repeat-pad
     shortcut (same windowed-basis decomposition as ops/mel.py's halo
     kernel; framing via in-VMEM shifted hop slices after a manual DMA),
  2. power -> mel projection -> log -> folded-BatchNorm affine,
  3. the tiled-mel frame assembly (models/clap.clap_mel_tiled's head / mid
     / tail row reuse) as static row-block copies in VMEM,
  4. the bicubic time interpolation as four PHASE-SPLIT matmuls — the
     (spec_w, n_frames) interp matrix is row-reordered to (dh, chunk, g) so
     each phase dh yields the rows that patch column dh consumes,
  5. patch embedding as ONE (tokens/16, 4*bins) x (4*bins, 16*C) matmul
     against a zero-padded block layout of the patch kernel — the classic
     (B, 1, spec, spec) image and its 6-d patchify transpose never exist,
  6. per-freq-block LayerNorm and 64-row-aligned block writes that land the
     tokens directly in the encoder's (grid_h, grid_w) row-major order.

No transposes, no sub-128-lane intermediates except the (rows, 64) mel
(inherent to 64 mel bins).  Parity: identical DFT/basis/log math to the
halo kernel; the interp/patch matmuls contract the same products in f32
with a different association order (tests/test_frontend_fused.py pins the
composition against frontend_tokens over the XLA mel).

Used by models/clap._clap_forward on the TPU backend for the bf16
repeat-pad path; AM_TPU_NO_FUSED_FRONTEND=1 (or AM_TPU_NO_PALLAS) falls
back to the separate-stage chain.
"""

from __future__ import annotations

import contextlib
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .attention import _dot_precision

__all__ = ["clap_tokens_fused", "fused_frontend_supported"]


def _x32_scope():
    if hasattr(jax, "enable_x64"):
        return jax.enable_x64(False)
    try:
        return jax.experimental.disable_x64()
    except AttributeError:  # pragma: no cover
        return contextlib.nullcontext()


# ----------------------------------------------------------------------
# host-side static planning
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def _plan(n: int, sr: int, frame: int, hop: int, n_mels: int, spec: int, ps: int):
    """Static geometry for an n-sample repeat-pad clip.

    Returns dict of python ints / numpy arrays; everything here mirrors
    models/clap.clap_mel_tiled's frame bookkeeping (head = reflect pad + one
    clip period + lookahead, mid = period-repeated head rows, tail = right
    reflect pad) and models/htsat.frontend_tokens' token geometry.
    """
    max_samples = 10 * sr
    assert max_samples % n == 0 and n % hop == 0 and n >= frame
    p = n // hop  # frames per clip period
    half = frame // 2
    n_frames = max_samples // hop + 1  # mel frames of the padded clip
    t_tail0 = (max_samples - half) // hop + 1
    extra = hop + half
    head_frames = p + 2
    tail_frames = n_frames - t_tail0
    # mid rows: head[2 + (o - 2) % p] for o in [p+2, t_tail0) — split into
    # contiguous runs so the kernel can use static block copies
    mid_src = 2 + (np.arange(head_frames, t_tail0) - 2) % p
    runs = []
    if len(mid_src):
        start = 0
        for i in range(1, len(mid_src) + 1):
            if i == len(mid_src) or mid_src[i] != mid_src[i - 1] + 1:
                runs.append(
                    (head_frames + start, int(mid_src[start]), i - start)
                )
                start = i
    copies = [(0, 0, head_frames)] + runs

    n_chunks = -(-frame // hop)
    hop_pad = -(-hop // 128) * 128
    # hop rows: head frames need head_frames + (n_chunks-1) rows; the tail's
    # rows append right after (tail frames read hops[tail_row0 + r + k]).
    # Mosaic DMA slices must be 8-row-aligned in offset AND shape (the halo
    # mel kernel's constraint, ops/mel.py:421-427), so both copies round up.
    head_rows = -(-(head_frames + (n_chunks - 1)) // 8) * 8
    tail_row0 = head_rows
    tail_rows = -(-(tail_frames + (n_chunks - 1)) // 8) * 8
    copies.append((t_tail0, tail_row0, tail_frames))

    # frame-matrix row count for the single DFT pass (covers head + tail)
    dft_rows = -(-(tail_row0 + tail_frames) // 128) * 128
    hops_rows = tail_row0 + tail_rows  # valid hop rows
    hops_scratch = max(
        -(-(dft_rows + n_chunks - 1) // 8) * 8, tail_row0 + tail_rows
    )

    # token geometry
    ratio = spec // n_mels
    spec_w = spec * ratio
    gw = spec_w // ratio // ps  # tokens along time per chunk
    fb = n_mels // ps  # token rows per chunk
    mel_rows_pad = -(-n_frames // 128) * 128
    return dict(
        p=p, half=half, n_frames=n_frames, head_frames=head_frames,
        t_tail0=t_tail0, extra=extra, copies=tuple(copies),
        n_chunks=n_chunks, hop_pad=hop_pad, tail_row0=tail_row0,
        dft_rows=dft_rows, hops_rows=hops_rows, hops_scratch=hops_scratch,
        ratio=ratio, spec_w=spec_w, gw=gw, fb=fb, mel_rows_pad=mel_rows_pad,
    )


@lru_cache(maxsize=None)
def _interp_phase_rows(n_frames: int, spec_w: int, ratio: int, ps: int, pad_cols: int):
    """(ps, spec_w // ps, pad_cols) f32: the bicubic interp matrix with rows
    regrouped by patch-column phase dh — rows [dh, chunk*gw + g] pick interp
    output index chunk*(spec_w//ratio) + g*ps + dh."""
    from ..models.htsat import _bicubic_matrix

    wi = _bicubic_matrix(n_frames, spec_w)  # (spec_w, n_frames)
    chunk_w = spec_w // ratio
    gw = chunk_w // ps
    out = np.zeros((ps, ratio * gw, pad_cols), np.float32)
    for dh in range(ps):
        for chunk in range(ratio):
            for g in range(gw):
                out[dh, chunk * gw + g, :n_frames] = wi[
                    chunk * chunk_w + g * ps + dh
                ]
    return out


@lru_cache(maxsize=None)
def _patch_selector(n_mels: int, ps: int):
    """(ps * n_mels * fb, ps*ps) 0/1 f32 selector S with
    S[(dh*n_mels + f) * fb + fblk, p] = 1 iff p = (f - ps*fblk)*ps + dh and
    ps*fblk <= f < ps*(fblk+1); (S @ wp).reshape(ps*n_mels, fb*C) is the
    zero-padded block patch-embed operand."""
    fb = n_mels // ps
    s = np.zeros((ps * n_mels * fb, ps * ps), np.float32)
    for dh in range(ps):
        for f in range(n_mels):
            fblk = f // ps
            dv = f - ps * fblk
            s[(dh * n_mels + f) * fb + fblk, dv * ps + dh] = 1.0
    return s


def fused_frontend_supported(n: int, sr: int, cfg) -> bool:
    """The fused kernel covers the production repeat-pad geometry: clip
    tiles a whole number of times, freq dim equals the mel bins, chunks and
    patches align (always true for HTSAT-base 5 s windows)."""
    frame, hop = 1024, 480
    max_samples = 10 * sr
    spec_h = cfg.spec_size // cfg.freq_ratio
    return (
        n < max_samples
        and max_samples % n == 0
        and n % hop == 0
        and n >= frame
        and cfg.num_mel_bins == spec_h
        and spec_h % cfg.patch_size == 0
        and cfg.spec_size % cfg.patch_size == 0
    )


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------
def clap_tokens_fused(
    audio,
    *,
    sr: int,
    cfg,
    fb_matrix: np.ndarray,
    bn_scale,
    bn_offset,
    patch_w,
    patch_b,
    ln_w,
    ln_b,
    frame: int = 1024,
    hop: int = 480,
    window: str = "hann",
    log_mode: str = "db",
    interpret: bool = False,
):
    """audio (B, n) repeat-pad clip -> patch tokens (B, grid^2, C) bf16.

    bn_scale/bn_offset: folded eval-BatchNorm affine over the mel bins.
    patch_w: (ps*ps, C) patch-embed weight (input-major); patch_b: (C,).
    ln_w/ln_b: patch_embed LayerNorm affine.  fb_matrix: (n_bins, n_mels)
    mel filterbank (numpy, host-built).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .mel import _dft_matrices, _fb_support_bins

    b, n = audio.shape
    ps = cfg.patch_size
    n_mels = cfg.num_mel_bins
    c = cfg.embed_dim
    pln = _plan(n, sr, frame, hop, n_mels, cfg.spec_size, ps)
    ratio, gw, fbk = pln["ratio"], pln["gw"], pln["fb"]
    n_tok = ratio * fbk * gw

    x = jnp.asarray(audio, jnp.float32)
    half, extra = pln["half"], pln["extra"]
    # head: left reflect pad + one period + lookahead; tail: last period's
    # end + right reflect pad (models/clap.clap_mel_tiled's construction)
    head_sig = jnp.concatenate(
        [x[:, 1 : half + 1][:, ::-1], x, x[:, :extra]], axis=1
    )
    tail_sig = jnp.concatenate(
        [x[:, n - extra :], x[:, -half - 1 : -1][:, ::-1]], axis=1
    )

    hop_pad = pln["hop_pad"]
    n_chunks = pln["n_chunks"]

    def to_hops(sig, rows):
        need = rows * hop
        if need > sig.shape[1]:
            sig = jnp.pad(sig, ((0, 0), (0, need - sig.shape[1])))
        else:
            sig = sig[:, :need]
        h = sig.astype(jnp.bfloat16).reshape(b, rows, hop)
        if hop_pad != hop:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, hop_pad - hop)))
        return h

    head_rows = pln["tail_row0"]
    tail_rows = pln["hops_rows"] - pln["tail_row0"]
    head_hops = to_hops(head_sig, head_rows)
    tail_hops = to_hops(tail_sig, tail_rows)

    cos_m, sin_m = _dft_matrices(frame, frame, window)
    n_keep = _fb_support_bins(fb_matrix)
    basis = np.zeros((n_chunks, hop_pad, 2 * n_keep), np.float32)
    for k in range(n_chunks):
        lo = k * hop
        ln_ = min(hop, frame - lo)
        basis[k, :ln_, :n_keep] = cos_m[lo : lo + ln_, :n_keep]
        basis[k, :ln_, n_keep:] = sin_m[lo : lo + ln_, :n_keep]
    fb_t = np.ascontiguousarray(fb_matrix[:n_keep].astype(np.float32))

    if log_mode != "db":
        raise ValueError("fused frontend implements the CLAP dB convention")

    mel_pad = pln["mel_rows_pad"]
    wi = jnp.asarray(
        _interp_phase_rows(pln["n_frames"], pln["spec_w"], ratio, ps, mel_pad),
        jnp.bfloat16,
    )  # (ps, ratio*gw, mel_pad)
    sel = jnp.asarray(_patch_selector(n_mels, ps))  # (ps*n_mels*fb, ps*ps)
    qcat = (
        jnp.dot(sel, jnp.asarray(patch_w, jnp.float32))
        .reshape(ps * n_mels, fbk * c)
        .astype(jnp.bfloat16)
    )
    pbias = jnp.tile(jnp.asarray(patch_b, jnp.float32), fbk).reshape(1, fbk * c)
    sc = jnp.asarray(bn_scale, jnp.float32).reshape(1, n_mels)
    of = jnp.asarray(bn_offset, jnp.float32).reshape(1, n_mels)
    lnw = jnp.asarray(ln_w, jnp.float32).reshape(1, c)
    lnb = jnp.asarray(ln_b, jnp.float32).reshape(1, c)
    eps = float(cfg.layer_norm_eps)

    dft_rows = pln["dft_rows"]
    hops_scratch = pln["hops_scratch"]
    copies = pln["copies"]
    tail_row0 = pln["tail_row0"]
    rg = ratio * gw

    def kernel(
        head_ref, tail_ref, basis_ref, fb_ref, sc_ref, of_ref,
        wi_ref, qcat_ref, pb_ref, lnw_ref, lnb_ref,
        out_ref, hops, melbuf, sem,
    ):
        bi = pl.program_id(0)
        slot = jax.lax.rem(bi, 2)

        def copies_for(s, sl):
            return (
                pltpu.make_async_copy(
                    head_ref.at[s], hops.at[sl, 0:head_rows], sem.at[sl, 0]
                ),
                pltpu.make_async_copy(
                    tail_ref.at[s],
                    hops.at[sl, tail_row0 : tail_row0 + tail_rows],
                    sem.at[sl, 1],
                ),
            )

        @pl.when(bi == 0)
        def _():
            for cp in copies_for(bi, slot):
                cp.start()

        @pl.when(bi + 1 < pl.num_programs(0))
        def _():
            for cp in copies_for(bi + 1, jax.lax.rem(bi + 1, 2)):
                cp.start()

        for cp in copies_for(bi, slot):
            cp.wait()

        # 1) chunked DFT over head+tail frame rows in one pass
        acc = None
        for k in range(n_chunks):
            lhs = hops[slot, k : k + dft_rows]
            rhs = basis_ref[k].astype(jnp.bfloat16)
            part = jnp.dot(
                lhs,
                rhs,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(lhs, rhs),
            )
            acc = part if acc is None else acc + part
        re = acc[:, :n_keep]
        im = acc[:, n_keep:]
        sq = re * re + im * im
        mel = jnp.dot(sq, fb_ref[:], preferred_element_type=jnp.float32)
        # 2) dB log + folded BatchNorm affine
        lm = jnp.float32(10.0) * (
            jnp.log(jnp.maximum(mel, jnp.float32(1e-10)))
            * jnp.float32(0.43429448190325176)
        )
        lm = (lm * sc_ref[0] + of_ref[0]).astype(jnp.bfloat16)

        # 3) tiled-mel assembly: static row-block copies into the padded
        # frame buffer (rows >= n_frames must be ZERO, not garbage — NaNs
        # would poison the interp matmul even against zero weights)
        melbuf[...] = jnp.zeros(melbuf.shape, melbuf.dtype)
        for dst, src, ln_rows in copies:
            melbuf[dst : dst + ln_rows, :] = lm[src : src + ln_rows]

        # 4) phase-split bicubic interp: rows of phase dh are the interp
        # outputs patch column dh consumes; lane-concat the ps phases
        mb = melbuf[...]
        xi = jnp.concatenate(
            [
                jnp.dot(
                    wi_ref[dh],
                    mb,
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(wi_ref[dh], mb),
                ).astype(jnp.bfloat16)
                for dh in range(ps)
            ],
            axis=1,
        )  # (ratio*gw, ps*n_mels), lanes ordered (dh, f)

        # 5) patch embed: one matmul against the zero-padded block operand
        qc = qcat_ref[:]
        tok = (
            jnp.dot(
                xi,
                qc,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(xi, qc),
            )
            + pb_ref[:]
        )  # (ratio*gw, fb*C), rows (chunk, g), lane blocks fblk

        # 6) per-freq-block LayerNorm + block writes in token order
        for fblk in range(fbk):
            blk = tok[:, fblk * c : (fblk + 1) * c]
            mu = jnp.mean(blk, axis=-1, keepdims=True)
            var = jnp.mean((blk - mu) * (blk - mu), axis=-1, keepdims=True)
            nrm = (
                (blk - mu) * jax.lax.rsqrt(var + jnp.float32(eps)) * lnw_ref[0]
                + lnb_ref[0]
            ).astype(jnp.bfloat16)
            for chunk in range(ratio):
                out_ref[
                    0,
                    (chunk * fbk + fblk) * gw : (chunk * fbk + fblk) * gw + gw,
                    :,
                ] = nrm[chunk * gw : (chunk + 1) * gw]

    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    with _x32_scope():
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                wspec((n_chunks, hop_pad, 2 * n_keep)),
                wspec((n_keep, n_mels)),
                wspec((1, n_mels)),
                wspec((1, n_mels)),
                wspec((ps, rg, mel_pad)),
                wspec((ps * n_mels, fbk * c)),
                wspec((1, fbk * c)),
                wspec((1, c)),
                wspec((1, c)),
            ],
            out_specs=pl.BlockSpec(
                (1, n_tok, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_tok, c), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, hops_scratch, hop_pad), jnp.bfloat16),
                pltpu.VMEM((mel_pad, n_mels), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            head_hops, tail_hops, jnp.asarray(basis), jnp.asarray(fb_t),
            sc, of, wi, qcat, pbias, lnw, lnb,
        )
    return out
