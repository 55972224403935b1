"""HTSAT (Hierarchical Token-Semantic Audio Transformer) encoder in JAX.

The audio tower of LAION-CLAP (reference embedders/clap.py wraps
``laion_clap.CLAP_Module(amodel="HTSAT-base")``).  This is a from-scratch JAX
implementation of the architecture — a Swin transformer over a 256 x 256
"token-semantic" reshaping of the log-mel spectrogram — written against the
published model structure (also mirrored by ``transformers``'
``ClapAudioEncoder``, which serves as the numerical oracle in
tests/test_htsat.py).

Parameter naming follows the HF Clap state dict
(``audio_encoder.layers.{i}.blocks.{j}.attention.self.query.weight`` etc.),
so converted checkpoints plug in directly; see models/clap.py for the
LAION-format key mapping.

TPU notes: all shapes are static (windows 8x8, resolutions 64/32/16/8), the
window partition/reverse are pure reshapes/transposes, attention runs as
batched MXU matmuls over (num_windows*B, 64, C) tokens, and the bicubic
time interpolation of reshape_mel2img is folded into a precomputed matmul.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "HTSATConfig",
    "htsat_encode",
    "htsat_encode_tokens",
    "init_params",
    "HTSAT_BASE",
    "HTSAT_TINY",
]

# Force the v0 image-materializing frontend (reshape_mel2img + patchify)
# instead of the restructured single-transpose path; A/B + debugging knob.
# Read ONCE at import — not part of the jit cache key (see CLAUDE.md).
_FRONTEND_V0 = bool(os.environ.get("AM_TPU_FRONTEND_V0"))


def _use_pallas_attention(n_windows: int) -> bool:
    """v1 fused Pallas attention (per-head thin matmuls) pays off only at
    the high-window-count early stages; superseded by v3 as the default —
    selectable with AM_TPU_ATTN_V1=1 for comparison.  Measured v5e B=64:
    stage 0 6.3 -> 2.0 ms/block v1, stage 1 2.5 -> 1.3.
    Disabled off-TPU and by AM_TPU_NO_PALLAS=1."""
    if os.environ.get("AM_TPU_NO_PALLAS") or not os.environ.get("AM_TPU_ATTN_V1"):
        return False
    return n_windows >= 16 and jax.default_backend() == "tpu"


def _use_pallas_attention_v3() -> bool:
    """v3 fused attention (all heads in one matmul, ops/attention.py) wins
    at EVERY stage (measured v5e B=64 ms/block, unshift/shift):
    stage 0: v1 2.26/2.22 -> 1.09/0.85; stage 1: 1.24/1.49 -> 0.39/0.70;
    stage 2 (vs XLA full block incl MLP 1.39/1.45): attn-half 0.43/0.41;
    stage 3: 0.50 vs 1.13 XLA full block."""
    return (
        not os.environ.get("AM_TPU_NO_PALLAS")
        and not os.environ.get("AM_TPU_ATTN_V1")
        and jax.default_backend() == "tpu"
    )


# 128-lane head-grouped score/context path inside the v3/v4 kernels
# (ops/attention.py:_lane_groups_for): cuts the block-diagonal wide-K/V
# build traffic AND the score/context MXU MACs by C/128 per stage (1x at
# stage 0, 2x/4x/8x at stages 1/2/3).  Read once at import — toggling after
# the first forward is ignored by the jit cache (AM_TPU_NO_PALLAS caveat).
_ATTN_GROUPED = os.environ.get("AM_TPU_ATTN_NOGROUP", "") != "1"


@dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    num_mel_bins: int = 64
    embed_dim: int = 128  # patch_embeds_hidden_size
    depths: tuple = (2, 2, 12, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def grid_size(self) -> int:
        return self.spec_size // self.patch_stride


# the reference's HTSAT-base (laion_clap amodel="HTSAT-base")
HTSAT_BASE = HTSATConfig(embed_dim=128, depths=(2, 2, 12, 2))
# HF transformers' default ClapAudioConfig (laion/clap-htsat-unfused)
HTSAT_TINY = HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2))


# ----------------------------------------------------------------------
# static tables (host, cached)
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def _relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (window^2, window^2)


@lru_cache(maxsize=None)
def _shift_attn_mask(height: int, width: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted-window attention: (n_windows, w^2, w^2)."""
    img = np.zeros((height, width))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    win = img.reshape(height // window, window, width // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=None)
def _merged_window_index(resolution: int, window: int):
    """Token -> (window id, within-window position) for the merged-window
    dense-attention layout: tokens in image row-major order, windows ordered
    (row-block, col-block) row-major (matching _window_partition /
    _shift_attn_mask)."""
    idx = np.arange(resolution)
    rr, cc = np.meshgrid(idx, idx, indexing="ij")
    wid = (rr // window) * (resolution // window) + (cc // window)
    pid = (rr % window) * window + (cc % window)
    return wid.reshape(-1), pid.reshape(-1)


def _merged_bias_mask(bm, resolution: int, window: int):
    """Scatter a per-window (nW or 1, heads, n, n) bias+mask onto the dense
    (1, heads, R^2, R^2) merged-window grid; cross-window pairs get -1e9
    (which underflows to probability 0.0 through the f32 softmax, making
    dense attention bitwise equal to per-window attention).  One gather over
    the bias tables per call; ~4 MB at stage 2, negligible next to the block
    activations."""
    wid, pid = _merged_window_index(resolution, window)
    same = jnp.asarray(wid[:, None] == wid[None, :])
    if bm.shape[0] == 1:
        dense = bm[0][:, pid[:, None], pid[None, :]]  # (heads, N, N)
    else:
        dense = bm[wid[:, None], :, pid[:, None], pid[None, :]]
        dense = dense.transpose(2, 0, 1)
    return jnp.where(same[None, None], dense[None], jnp.float32(-1e9))


@lru_cache(maxsize=None)
def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) 1-D bicubic interpolation matrix, align_corners=True,
    border-replicated taps (torch F.interpolate semantics), a = -0.75."""
    a = -0.75

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    w = np.zeros((n_out, n_in))
    if n_out == 1:
        src = np.zeros(1)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(int)
    frac = src - i0
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, n_in - 1)
        wt = kernel(frac - tap)
        np.add.at(w, (np.arange(n_out), idx), wt)
    return w.astype(np.float32)


# ----------------------------------------------------------------------
# building blocks
# ----------------------------------------------------------------------
def _layer_norm(x, w, b, eps):
    """LayerNorm with f32 statistics regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) + b.astype(
        jnp.float32
    )
    return out.astype(x.dtype)


def _linear(x, params, prefix):
    """Matmul in the activation dtype (bf16 on MXU), f32 accumulation."""
    w = params[f"{prefix}.weight"].astype(x.dtype)
    out = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    b = params.get(f"{prefix}.bias")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _window_partition(x, window: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(wins, window: int, h: int, w: int):
    c = wins.shape[-1]
    x = wins.reshape(-1, h // window, w // window, window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def _window_attention(x, params, prefix, num_heads: int, window: int, attn_mask):
    """x: (B*nW, w^2, C); attn_mask: (nW, w^2, w^2) or None."""
    bn, n, c = x.shape
    head = c // num_heads

    # fused qkv: one (C -> 3C) matmul instead of three (C -> C) — small-C
    # stages otherwise underfill the MXU (the concat folds at compile time)
    w_fused = jnp.concatenate(
        [params[f"{prefix}.self.{name}.weight"] for name in ("query", "key", "value")],
        axis=0,
    ).astype(x.dtype)
    y = jnp.dot(x, w_fused.T, preferred_element_type=jnp.float32)
    if f"{prefix}.self.query.bias" in params:
        b_fused = jnp.concatenate(
            [params[f"{prefix}.self.{name}.bias"] for name in ("query", "key", "value")]
        ).astype(jnp.float32)
        y = y + b_fused
    y = y.astype(x.dtype)
    q, k, v = (
        y[..., i * c : (i + 1) * c].reshape(bn, n, num_heads, head).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    # scores matmul accumulates f32 on the MXU but the materialized score
    # tensor stays in the activation dtype: the (B*nW, h, w^2, w^2) scores
    # are the largest activation in the network and the forward is
    # HBM-bandwidth-bound (softmax max-subtraction keeps bf16 stable here;
    # windows are only 64 tokens)
    scores = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    scores = scores / jnp.asarray(np.sqrt(head), dtype=x.dtype)

    table = params[f"{prefix}.self.relative_position_bias_table"].astype(x.dtype)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, num_heads).transpose(2, 0, 1)
    scores = scores + bias[None]

    if attn_mask is not None:
        n_windows = attn_mask.shape[0]
        scores = scores.reshape(bn // n_windows, n_windows, num_heads, n, n)
        scores = scores + jnp.asarray(attn_mask, dtype=x.dtype)[None, :, None]
        scores = scores.reshape(bn, num_heads, n, n)

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(bn, n, c)
    return _linear(ctx, params, f"{prefix}.output.dense")


def _attention_half_pallas(
    x,
    params,
    prefix,
    cfg: HTSATConfig,
    resolution: int,
    shift: int,
    num_heads: int,
    window: int,
    merge: bool = False,
):
    """x + WindowAttention(LN(x)) via the fused Pallas block kernel
    (ops/attention.py).  The per-head weight splits / scale folds trace as
    tiny XLA ops on the weights (fused into constants-like prep each call —
    negligible next to the block activations).

    ``merge=True`` runs all windows of an image as ONE dense attention over
    the whole (resolution x resolution) token grid with a block-diagonal
    additive mask (-1e9 off the per-window blocks).  Because the masked
    entries underflow to exactly 0.0 after the f32 softmax (exp(-1e9 - m)
    with a finite in-window row max), the dense result is bitwise identical
    to per-window attention — but Mosaic sees one big MXU matmul per image
    instead of n_windows small ones, which is what the few-window late
    stages need (the unrolled batched-matmul fixed cost dominates there)."""
    from ..ops.attention import swin_attention_block_pallas

    b, _, c = x.shape
    h = w = resolution
    n = window * window
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)
    pre = f"{prefix}.attention"
    dt = x.dtype

    wq = params[f"{pre}.self.query.weight"].T.reshape(c, num_heads, d)
    wq = (wq * jnp.float32(scale)).transpose(1, 0, 2).astype(dt)
    bq = (params[f"{pre}.self.query.bias"].reshape(num_heads, d) * scale).astype(
        jnp.float32
    )
    wk = params[f"{pre}.self.key.weight"].T.reshape(c, num_heads, d)
    wk = wk.transpose(1, 0, 2).astype(dt)
    wv = params[f"{pre}.self.value.weight"].T.reshape(c, num_heads, d)
    wv = wv.transpose(1, 0, 2).astype(dt)
    wp = params[f"{pre}.output.dense.weight"].T.reshape(num_heads, d, c).astype(dt)
    # value bias folds through the projection (softmax rows sum to 1);
    # key bias drops out (constant per score row)
    bv = params[f"{pre}.self.value.bias"].reshape(num_heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp.astype(jnp.float32))
    ).astype(jnp.float32)

    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, num_heads).transpose(2, 0, 1)
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(h, w, window, shift))
        bm = bias[None] + mask[:, None]
    else:
        bm = bias[None]

    if merge:
        bm = _merged_bias_mask(bm, h, window)
        window = h  # one dense "window" spanning the whole image

    out = swin_attention_block_pallas(
        x.reshape(b, h, w, c),
        params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32),
        wq,
        bq,
        wk,
        wv,
        wp,
        bp,
        bm,
        num_heads,
        window,
        shift,
        eps=cfg.layer_norm_eps,
    )
    return out.reshape(b, h * w, c)


def _v3_kernel_weights(
    params, prefix, resolution: int, shift: int, num_heads: int, window: int, dt
):
    """Weight layout shared by the v3/v4 kernels: fused (C, 3C) wqkv with the
    1/sqrt(d) scale folded into q AND the LN affine (ln_w/ln_b) folded into
    the weights/bias (the kernel only mean/var-normalizes — two fewer vector
    passes over the full activation), the value bias folded into the
    projection bias, and the (nW or 1, heads, n, n) additive bias+mask
    table."""
    h = w = resolution
    n = window * window
    c = params[f"{prefix}.attention.self.query.weight"].shape[0]
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)
    pre = f"{prefix}.attention"

    wqkv_f32 = jnp.concatenate(
        [
            params[f"{pre}.self.query.weight"].T * jnp.float32(scale),
            params[f"{pre}.self.key.weight"].T,
            params[f"{pre}.self.value.weight"].T,
        ],
        axis=1,
    ).astype(jnp.float32)
    ln_w = params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32)
    ln_b = params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32)
    wqkv = (ln_w[:, None] * wqkv_f32).astype(dt)
    bq3 = (
        jnp.concatenate(
            [
                params[f"{pre}.self.query.bias"] * jnp.float32(scale),
                jnp.zeros(2 * c, jnp.float32),
            ]
        )
        + ln_b @ wqkv_f32
    ).astype(jnp.float32)
    wp = params[f"{pre}.output.dense.weight"].T.astype(dt)
    wp_h = params[f"{pre}.output.dense.weight"].T.reshape(num_heads, d, c)
    bv = params[f"{pre}.self.value.bias"].reshape(num_heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp_h.astype(jnp.float32))
    ).astype(jnp.float32)

    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, num_heads).transpose(2, 0, 1)
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(h, w, window, shift))
        bm = bias[None] + mask[:, None]
    else:
        bm = bias[None]
    return wqkv, bq3, wp, bp, bm


def _attention_half_pallas_v3(
    x, params, prefix, cfg: HTSATConfig, resolution: int, shift: int,
    num_heads: int, window: int,
):
    """x + WindowAttention(LN(x)) via the all-heads-one-matmul v3 kernel
    (ops/attention.py: _attn_block_kernel_v3) — the default TPU attention
    path at every stage (see _use_pallas_attention_v3 for measurements)."""
    from ..ops.attention import swin_attention_block_pallas_v3

    b, _, c = x.shape
    h = w = resolution
    wqkv, bq3, wp, bp, bm = _v3_kernel_weights(
        params, prefix, resolution, shift, num_heads, window, x.dtype
    )

    out = swin_attention_block_pallas_v3(
        x.reshape(b, h, w, c),
        None,  # LN affine pre-folded into wqkv/bq3 by _v3_kernel_weights
        None,
        wqkv,
        bq3,
        wp,
        bp,
        bm,
        num_heads,
        window,
        shift,
        eps=cfg.layer_norm_eps,
        grouped=_ATTN_GROUPED,
    )
    return out.reshape(b, h * w, c)


def _whole_block_pallas_v4(
    x, params, prefix, cfg: HTSATConfig, resolution: int, shift: int,
    num_heads: int, window: int, interpret: bool = False,
):
    """The WHOLE swin block (v3 attention half + LN2/MLP half) in one
    pallas_call (ops/attention.py: _swin_block_kernel_v4) — the attention
    residual never round-trips HBM between the halves."""
    from ..ops.attention import swin_block_pallas_v4

    b, _, c = x.shape
    h = w = resolution
    dt = x.dtype
    wqkv, bq3, wp, bp, bm = _v3_kernel_weights(
        params, prefix, resolution, shift, num_heads, window, dt
    )
    out = swin_block_pallas_v4(
        x.reshape(b, h, w, c),
        None,  # LN affine pre-folded into wqkv/bq3 by _v3_kernel_weights
        None,
        wqkv,
        bq3,
        wp,
        bp,
        bm,
        params[f"{prefix}.layernorm_after.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_after.bias"].astype(jnp.float32),
        params[f"{prefix}.intermediate.dense.weight"].T.astype(dt),
        params[f"{prefix}.intermediate.dense.bias"].astype(jnp.float32),
        params[f"{prefix}.output.dense.weight"].T.astype(dt),
        params[f"{prefix}.output.dense.bias"].astype(jnp.float32),
        num_heads,
        window,
        shift,
        eps=cfg.layer_norm_eps,
        grouped=_ATTN_GROUPED,
        interpret=interpret,
    )
    return out.reshape(b, h * w, c)


# Per-stage v4 dispatch: comma list of {stage}{u|s} entries (u = unshifted
# blocks, s = shifted).  Re-swept after each kernel-economics change (v5e
# full-forward A/B, scripts/ab_forward.py 30-iter).  Post-scale-softmax
# round (B=128, poly GELU): 2u,2s,0u,0s,1u,1s,3u **32.30 ms** vs
# ...,1u,1s 32.57-32.69 / +3u,3s 32.34 / 2u,2s,0u,0s 32.91 / none 34.77 —
# with the softmax reduced to clamped exp + narrow post-contraction
# scaling there is nothing left for XLA to overlap even at stage 3's few
# windows, so whole-block fusion now wins everywhere except the shifted
# stage-3 entry (tie).  History: pre-softmax-fix the stage-0/1 entries
# LOST (1u 23.90, 1s 24.10 vs 2u,2s 22.87 at B=64) and stage-3 lost
# through the previous round (2u,2s,3u 20.58 vs 19.68).  Read once at
# import — toggling after the first forward would be silently ignored by
# the jit cache (same caveat as AM_TPU_NO_PALLAS).
_V4_STAGES = frozenset(
    s.strip()
    for s in os.environ.get(
        "AM_TPU_V4_STAGES", "2u,2s,0u,0s,1u,1s,3u"
    ).split(",")
    if s.strip()
)


def _use_pallas_v4(stage: int, shift: int) -> bool:
    if os.environ.get("AM_TPU_NO_PALLAS") or os.environ.get("AM_TPU_ATTN_V1"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return f"{stage}{'s' if shift else 'u'}" in _V4_STAGES


def _swin_block(
    x, params, prefix, cfg: HTSATConfig, resolution: int, shift: int,
    num_heads: int, stage: int = -1,
):
    """x: (B, H*W, C) -> same.  Static resolution/shift/heads."""
    window = cfg.window_size
    if resolution <= window:
        window = resolution
        shift = 0
    h = w = resolution
    b, _, c = x.shape
    num_heads_prefix = f"{prefix}.attention"
    n_windows = (h // window) * (w // window)

    # the fused MLP wins where the ROW count (batch x tokens) is large
    # (stages 0/1: XLA 2.4/1.3 -> 1.0/0.65 ms per block; stage 2 at B=64:
    # 0.61 -> 0.32, the r2 A/B); at small row counts XLA's own fusion of the
    # repeated blocks is already competitive and the extra kernel boundary
    # costs more than it saves (measured stage-3 regression at 4096 rows)
    use_pallas_mlp = (
        (x.shape[1] >= 1024 or x.shape[0] * x.shape[1] >= 16384)
        and not os.environ.get("AM_TPU_NO_PALLAS")
        and jax.default_backend() == "tpu"
    )

    # Merged-window dense attention (one masked 256-token attention per
    # image instead of 4 windows) is bitwise-exact but measured SLOWER than
    # XLA's per-window path at stage 2 on v5e (1.34/1.81 ms/block merged vs
    # 0.76/1.35 XLA, B=64): the 4x dense softmax work outweighs the saved
    # batched-matmul unroll overhead.  Kept as an opt-in for other topologies.
    merge_windows = (
        window < resolution <= 16
        and bool(os.environ.get("AM_TPU_MERGED_ATTN"))
        and not os.environ.get("AM_TPU_NO_PALLAS")
        and jax.default_backend() == "tpu"
    )
    if _use_pallas_v4(stage, shift) and not merge_windows:
        return _whole_block_pallas_v4(
            x, params, prefix, cfg, resolution, shift, num_heads, window
        )
    if _use_pallas_attention_v3() and not merge_windows:
        x = _attention_half_pallas_v3(
            x, params, prefix, cfg, resolution, shift, num_heads, window
        )
    elif _use_pallas_attention(n_windows) or merge_windows:
        x = _attention_half_pallas(
            x,
            params,
            prefix,
            cfg,
            resolution,
            shift,
            num_heads,
            window,
            merge=merge_windows,
        )
    else:
        shortcut = x
        x = _layer_norm(
            x,
            params[f"{prefix}.layernorm_before.weight"],
            params[f"{prefix}.layernorm_before.bias"],
            cfg.layer_norm_eps,
        )
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            attn_mask = _shift_attn_mask(h, w, window, shift)
        else:
            attn_mask = None

        wins = _window_partition(x, window)
        wins = _window_attention(
            wins, params, num_heads_prefix, num_heads, window, attn_mask
        )
        x = _window_reverse(wins, window, h, w)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(b, h * w, c)
        x = shortcut + x

    if use_pallas_mlp:
        from ..ops.mlp import mlp_block_pallas

        return mlp_block_pallas(
            x,
            params[f"{prefix}.layernorm_after.weight"].astype(jnp.float32),
            params[f"{prefix}.layernorm_after.bias"].astype(jnp.float32),
            params[f"{prefix}.intermediate.dense.weight"].T.astype(x.dtype),
            params[f"{prefix}.intermediate.dense.bias"].astype(jnp.float32),
            params[f"{prefix}.output.dense.weight"].T.astype(x.dtype),
            params[f"{prefix}.output.dense.bias"].astype(jnp.float32),
            eps=cfg.layer_norm_eps,
        )
    y = _layer_norm(
        x,
        params[f"{prefix}.layernorm_after.weight"],
        params[f"{prefix}.layernorm_after.bias"],
        cfg.layer_norm_eps,
    )
    y = _linear(y, params, f"{prefix}.intermediate.dense")
    y = jax.nn.gelu(y, approximate=False)
    y = _linear(y, params, f"{prefix}.output.dense")
    return x + y


def _patch_merging_gather(x, params, prefix, cfg: HTSATConfig, resolution: int):
    """Direct form (concat 2x2 neighborhood -> LN -> reduction linear);
    kept as the parity oracle for the conv formulation below."""
    h = w = resolution
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    x = x.reshape(b, -1, 4 * c)
    x = _layer_norm(
        x,
        params[f"{prefix}.norm.weight"],
        params[f"{prefix}.norm.bias"],
        cfg.layer_norm_eps,
    )
    return _linear(x, params, f"{prefix}.reduction")


def _use_pallas_merge(stage: int = -1) -> bool:
    """Per-stage fused-merge dispatch (AM_TPU_FUSED_MERGE_STAGES, comma
    list of stage indices; default all).  The round-5 phase ledger flagged
    merge 2 (16x16, C=512->1024) at 1.57 ms/128 standalone vs the conv
    form's historical 0.22 — the per-stage table lets an in-context A/B
    decide each merge separately.  Read per trace; a toggle after the
    first forward is ignored by the jit cache (same caveat as
    AM_TPU_NO_PALLAS)."""
    if os.environ.get("AM_TPU_NO_PALLAS") or os.environ.get(
        "AM_TPU_NO_FUSED_MERGE"
    ):
        return False
    if jax.default_backend() != "tpu":
        return False
    stages = os.environ.get("AM_TPU_FUSED_MERGE_STAGES")
    if stages is None:
        return True
    return str(stage) in {s.strip() for s in stages.split(",")}


def _patch_merging(x, params, prefix, cfg: HTSATConfig, resolution: int):
    """Patch merging as ONE 2x2/stride-2 conv with the LayerNorm folded in.

    The direct form (4 strided gathers -> concat -> LN -> linear) is
    relayout-bound on TPU (merge 0 at B=64: 1.46 ms vs a ~0.1 ms matmul
    floor; reshape+transpose measured even slower at 1.84).  Algebraically
      LN(concat) @ W == rs * (concat @ (g*W)) - rs*mu * (g @ W) + b @ W
    where mu/rs are the concat row's LN statistics — and ``concat @ (g*W)``
    over 2x2 patches IS a stride-2 conv, which XLA lowers straight onto the
    MXU with no materialized gather.  mu/var come from channel-mean passes
    pooled over the 2x2 patch (the concat never exists).

    On the TPU backend the whole thing runs as ONE Pallas kernel
    (ops/merge.patch_merge_pallas): the XLA form still walks the activations
    through HBM three times (two stat passes + conv); the kernel does the
    quadrant slices, LN stats and the four weight-block matmuls in a single
    VMEM pass.
    """
    h = w = resolution
    b, _, c = x.shape
    dt = x.dtype
    x4 = x.reshape(b, h, w, c)

    g = params[f"{prefix}.norm.weight"].astype(jnp.float32)
    be = params[f"{prefix}.norm.bias"].astype(jnp.float32)
    w_io = params[f"{prefix}.reduction.weight"].T.astype(jnp.float32)  # (4c, oc)
    oc = w_io.shape[1]
    wg = (g[:, None] * w_io).reshape(4, c, oc)

    # stage index from the resolution (merge s runs at grid_size / 2^s)
    merge_stage = (cfg.grid_size // resolution).bit_length() - 1
    if _use_pallas_merge(merge_stage) and h % 2 == 0 and w % 2 == 0:
        from ..ops.merge import patch_merge_pallas

        return patch_merge_pallas(
            x.astype(dt),
            wg.astype(dt),
            (g @ w_io).astype(jnp.float32),
            (be @ w_io).astype(jnp.float32),
            h=h,
            w=w,
            eps=float(cfg.layer_norm_eps),
        )
    # concat block order j=[x00, x10, x01, x11] -> kernel (kh, kw) position
    ker = jnp.stack(
        [jnp.stack([wg[0], wg[2]], axis=0), jnp.stack([wg[1], wg[3]], axis=0)],
        axis=0,
    )  # (kh=2, kw=2, c, oc)
    svec = g @ w_io  # (oc,)
    tvec = be @ w_io

    # LN stats of the 4c concat row == channel moments pooled over the patch
    # (centered second pass: the raw E[x^2]-mu^2 form cancels in f32 when
    # |mean| >> std, same reason data.batch_moments centers).  Both passes
    # are reductions with f32 ACCUMULATION over the bf16 input — an explicit
    # f32 copy of the (b, h, w, c) activations defeats XLA's convert-into-
    # reduce fusion and was measured 5.8x slower at B=128
    # (scripts/probe_merge.py: 15.3 ms materialized vs 2.65 fused).
    m1 = jnp.mean(x4, axis=-1, dtype=jnp.float32)
    mu = 0.25 * (
        m1[:, 0::2, 0::2] + m1[:, 1::2, 0::2] + m1[:, 0::2, 1::2] + m1[:, 1::2, 1::2]
    )
    h2, w2 = h // 2, w // 2
    mu_up = jnp.broadcast_to(
        mu[:, :, None, :, None], (b, h2, 2, w2, 2)
    ).reshape(b, h, w)
    m2 = jnp.mean(
        jnp.square(x4.astype(jnp.float32) - mu_up[..., None]),
        axis=-1,
        dtype=jnp.float32,
    )
    var = 0.25 * (
        m2[:, 0::2, 0::2] + m2[:, 1::2, 0::2] + m2[:, 0::2, 1::2] + m2[:, 1::2, 1::2]
    )
    rs = jax.lax.rsqrt(var + cfg.layer_norm_eps)

    conv = jax.lax.conv_general_dilated(
        x4.astype(dt),
        ker.astype(dt),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (b, h/2, w/2, oc)
    out = conv * rs[..., None] + (tvec - (mu * rs)[..., None] * svec)
    return out.reshape(b, (h // 2) * (w // 2), oc).astype(dt)


# ----------------------------------------------------------------------
# the encoder
# ----------------------------------------------------------------------
def reshape_mel2img(mel, cfg: HTSATConfig, operand_dtype=None):
    """(B, T, n_mels) log-mel -> (B, 1, spec, spec) image.

    Time is bicubic-interpolated (align_corners) up to spec_size*freq_ratio
    and folded as freq_ratio vertical chunks (HTSAT token-semantic layout).

    ``operand_dtype``: dtype the interp matmul operands are cast to.  The
    bf16-compute forward passes bf16: on TPU, XLA's default matmul
    precision feeds the MXU bf16 from f32 operands anyway (measured
    bitwise-identical output), but the explicit cast avoids the f32
    operand traffic — 2.8x faster (3.40 -> 1.21 ms / 128 clips,
    scripts/probe_frontend.py).  Default None keeps f32 operands (exact
    path for f32-compute parity runs).
    """
    b, t, f = mel.shape
    spec_width = cfg.spec_size * cfg.freq_ratio  # target time length
    spec_height = cfg.spec_size // cfg.freq_ratio  # per-chunk freq length
    if t > spec_width or f > spec_height:
        raise ValueError("mel larger than the swin input size")
    op_dt = jnp.float32 if operand_dtype is None else operand_dtype
    x = mel
    if t < spec_width:
        w = jnp.asarray(_bicubic_matrix(t, spec_width), dtype=op_dt)
        x = jnp.einsum(
            "ot,btf->bof",
            w,
            x.astype(op_dt),
            preferred_element_type=jnp.float32,
        )
    if f < spec_height:
        w = jnp.asarray(_bicubic_matrix(f, spec_height), dtype=op_dt)
        x = jnp.einsum(
            "of,btf->bto",
            w,
            x.astype(op_dt),
            preferred_element_type=jnp.float32,
        )
    # (B, 1, T, F) -> (B, freq_ratio, T/freq_ratio, F) -> (B, 1, F*ratio, T/ratio)
    x = x.reshape(b, cfg.freq_ratio, spec_width // cfg.freq_ratio, spec_height)
    x = x.transpose(0, 1, 3, 2)
    x = x.reshape(b, 1, spec_height * cfg.freq_ratio, spec_width // cfg.freq_ratio)
    return x


def _patch_tokens(params, x, cfg: HTSATConfig, compute_dtype):
    """(B, 1, spec, spec) image -> patch-embed tokens (B, N, C) + LN.

    The k=4 s=4 single-channel conv expressed as a patch reshape + one MXU
    matmul (the conv lowers through XLA's general conv path at ~40% of the
    matmul's speed for C_in=1)."""
    ps = cfg.patch_size
    bsz, _, hh, ww = x.shape
    xp = (
        x[:, 0]
        .reshape(bsz, hh // ps, ps, ww // ps, ps)
        .transpose(0, 1, 3, 2, 4)
        .reshape(bsz, (hh // ps) * (ww // ps), ps * ps)
    )
    w = (
        params["audio_encoder.patch_embed.proj.weight"]
        .reshape(-1, ps * ps)
        .T.astype(compute_dtype)
    )
    b = params["audio_encoder.patch_embed.proj.bias"]
    x = jnp.dot(
        xp.astype(compute_dtype), w, preferred_element_type=jnp.float32
    ) + b.astype(jnp.float32)
    x = x.astype(compute_dtype)  # (B, N, C) in row-major (grid_h, grid_w) order
    return _layer_norm(
        x,
        params["audio_encoder.patch_embed.norm.weight"],
        params["audio_encoder.patch_embed.norm.bias"],
        cfg.layer_norm_eps,
    )


def frontend_tokens(params, mel, cfg: HTSATConfig, compute_dtype):
    """BatchNorm'd (B, T, F) log-mel -> patch tokens (B, N, C), restructured.

    Exact-math refactor of reshape_mel2img + _patch_tokens that never
    materializes the (B, 1, spec, spec) image: because patches never
    straddle the freq_ratio chunks (spec_height is a patch-size multiple),
    the time-interpolated mel reshapes straight into
    (b, chunk, gw, dh, fblk, dv) and ONE 6-d transpose produces the
    patch-vector rows in token order — replacing two full relayout passes
    (the mel2img chunk fold and the patchify gather) with one.  The matmul
    contracts the same 16 products in the same f32 accumulation, so the
    result is bitwise-equal to the image path (tests/test_htsat.py pins
    equality).  Falls back to the image path for shapes where the
    chunk-alignment argument does not hold (never for HTSAT-base).
    """
    ratio, ps = cfg.freq_ratio, cfg.patch_size
    spec_w = cfg.spec_size * ratio  # target time length
    spec_h = cfg.spec_size // ratio  # per-chunk freq length
    bsz, t, f = mel.shape
    chunk_w = spec_w // ratio
    # bf16-compute forwards run the interp matmul on bf16 operands == XLA's
    # implicit MXU feed, minus the operand traffic (bitwise-identical on
    # TPU, 2.8x faster — see reshape_mel2img); f32 compute keeps f32.
    op_dt = (
        jnp.bfloat16
        if compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
        else None
    )
    if _FRONTEND_V0 or f != spec_h or spec_h % ps or chunk_w % ps:
        return _patch_tokens(
            params, reshape_mel2img(mel, cfg, op_dt), cfg, compute_dtype
        )
    if t < spec_w:
        w = jnp.asarray(
            _bicubic_matrix(t, spec_w),
            dtype=jnp.float32 if op_dt is None else op_dt,
        )
        x = jnp.einsum(
            "ot,btf->bof",
            w,
            mel.astype(w.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        x = mel
    gw = chunk_w // ps  # tokens along time within a chunk
    fb = spec_h // ps  # token rows per chunk
    # t' = chunk*chunk_w + gw*ps + dh ; f = fblk*ps + dv ;
    # token (gh, gw) with gh = chunk*fb + fblk, patch vector index dv*ps+dh
    a = x.reshape(bsz, ratio, gw, ps, fb, ps)
    a = a.transpose(0, 1, 4, 2, 5, 3).reshape(bsz, ratio * fb * gw, ps * ps)
    wp = (
        params["audio_encoder.patch_embed.proj.weight"]
        .reshape(-1, ps * ps)
        .T.astype(compute_dtype)
    )
    b = params["audio_encoder.patch_embed.proj.bias"]
    tok = jnp.dot(
        a.astype(compute_dtype), wp, preferred_element_type=jnp.float32
    ) + b.astype(jnp.float32)
    tok = tok.astype(compute_dtype)
    return _layer_norm(
        tok,
        params["audio_encoder.patch_embed.norm.weight"],
        params["audio_encoder.patch_embed.norm.bias"],
        cfg.layer_norm_eps,
    )


def htsat_encode(
    params: dict,
    mel,
    cfg: HTSATConfig = HTSAT_BASE,
    compute_dtype=None,
    batch_norm_applied: bool = False,
):
    """mel: (B, T, n_mels) log-mel -> pooled latent (B, num_features) f32.

    Mirrors ClapAudioEncoder.forward: batch-norm over mel bins,
    reshape_mel2img, patch embed, 4 swin stages with patch merging, final
    layer norm, token-semantic regrouping, average pool.

    ``compute_dtype`` (e.g. jnp.bfloat16) sets the activation/matmul dtype
    inside the transformer; normalization statistics, softmax, and the final
    pooling stay float32.

    ``batch_norm_applied=True`` means the caller already applied the
    eval-mode BatchNorm (models/clap folds it into the mel kernel epilogue);
    the mel is consumed in whatever dtype it arrives (bf16 from the fused
    mel path) instead of being forced to f32.
    """
    if compute_dtype is None:
        compute_dtype = jnp.float32
    if not batch_norm_applied:
        mel = jnp.asarray(mel, dtype=jnp.float32)
        # BatchNorm2d over the mel-bin axis, eval mode (running stats)
        mean = params["audio_encoder.batch_norm.running_mean"]
        var = params["audio_encoder.batch_norm.running_var"]
        gamma = params["audio_encoder.batch_norm.weight"]
        beta = params["audio_encoder.batch_norm.bias"]
        mel = (mel - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta

    x = frontend_tokens(params, mel, cfg, compute_dtype)
    return htsat_encode_tokens(params, x, cfg)


def htsat_encode_tokens(params: dict, x, cfg: HTSATConfig = HTSAT_BASE):
    """Patch tokens (B, grid^2, C) -> pooled latent (B, num_features) f32:
    the swin stages, final LN, token-semantic regroup, average pool.
    Entry point for callers that produce the tokens themselves (the fused
    audio->tokens frontend kernel, ops/frontend_fused.py)."""
    resolution = cfg.grid_size
    n_stages = len(cfg.depths)
    for i in range(n_stages):
        for j in range(cfg.depths[i]):
            shift = 0 if j % 2 == 0 else cfg.window_size // 2
            x = _swin_block(
                x,
                params,
                f"audio_encoder.layers.{i}.blocks.{j}",
                cfg,
                resolution,
                shift,
                cfg.num_heads[i],
                stage=i,
            )
        if i < n_stages - 1:
            x = _patch_merging(
                x, params, f"audio_encoder.layers.{i}.downsample", cfg, resolution
            )
            resolution //= 2

    x = _layer_norm(
        x,
        params["audio_encoder.norm.weight"],
        params["audio_encoder.norm.bias"],
        cfg.layer_norm_eps,
    )

    # token-semantic regroup + average pool (ClapAudioEncoder tail)
    bsz, n, c = x.shape
    freq_shape = temporal_shape = resolution  # spec // 8 // 4
    x = x.transpose(0, 2, 1).reshape(bsz, c, freq_shape, temporal_shape)
    c_freq_bin = freq_shape // cfg.freq_ratio
    x = x.reshape(bsz, c, freq_shape // c_freq_bin, c_freq_bin, temporal_shape)
    x = x.transpose(0, 1, 3, 2, 4).reshape(bsz, c, c_freq_bin, -1)
    latent = x.reshape(bsz, c, -1).astype(jnp.float32).mean(axis=-1)
    return latent


# ----------------------------------------------------------------------
# init / param plumbing
# ----------------------------------------------------------------------
def init_params(cfg: HTSATConfig = HTSAT_BASE, seed: int = 0) -> dict:
    """Seeded random parameters with HF Clap naming (+ static head counts)."""
    rng = np.random.default_rng(seed)
    p = {}

    def lin(prefix, d_in, d_out, bias=True):
        p[f"{prefix}.weight"] = (
            rng.normal(scale=0.02, size=(d_out, d_in)).astype(np.float32)
        )
        if bias:
            p[f"{prefix}.bias"] = np.zeros(d_out, np.float32)

    def ln(prefix, d):
        p[f"{prefix}.weight"] = np.ones(d, np.float32)
        p[f"{prefix}.bias"] = np.zeros(d, np.float32)

    nm = cfg.num_mel_bins
    p["audio_encoder.batch_norm.weight"] = np.ones(nm, np.float32)
    p["audio_encoder.batch_norm.bias"] = np.zeros(nm, np.float32)
    p["audio_encoder.batch_norm.running_mean"] = np.zeros(nm, np.float32)
    p["audio_encoder.batch_norm.running_var"] = np.ones(nm, np.float32)

    ps = cfg.patch_size
    p["audio_encoder.patch_embed.proj.weight"] = rng.normal(
        scale=0.02, size=(cfg.embed_dim, 1, ps, ps)
    ).astype(np.float32)
    p["audio_encoder.patch_embed.proj.bias"] = np.zeros(cfg.embed_dim, np.float32)
    ln("audio_encoder.patch_embed.norm", cfg.embed_dim)

    for i, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * 2**i
        for j in range(depth):
            pre = f"audio_encoder.layers.{i}.blocks.{j}"
            ln(f"{pre}.layernorm_before", dim)
            for name in ("query", "key", "value"):
                lin(f"{pre}.attention.self.{name}", dim, dim, bias=cfg.qkv_bias)
            p[f"{pre}.attention.self.relative_position_bias_table"] = rng.normal(
                scale=0.02,
                size=((2 * cfg.window_size - 1) ** 2, cfg.num_heads[i]),
            ).astype(np.float32)
            lin(f"{pre}.attention.output.dense", dim, dim)
            ln(f"{pre}.layernorm_after", dim)
            hidden = int(cfg.mlp_ratio * dim)
            lin(f"{pre}.intermediate.dense", dim, hidden)
            lin(f"{pre}.output.dense", hidden, dim)
        if i < len(cfg.depths) - 1:
            pre = f"audio_encoder.layers.{i}.downsample"
            ln(f"{pre}.norm", 4 * dim)
            lin(f"{pre}.reduction", 4 * dim, 2 * dim, bias=False)

    ln("audio_encoder.norm", cfg.num_features)
    return p
