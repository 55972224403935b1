"""Interpret-mode parity tests for the fused model-path Pallas kernels.

The TPU forward of the HTSAT tower uses three fused kernels
(ops/attention.py, ops/mlp.py, ops/mel.py::log_mel_pallas); each must match
its XLA reference implementation.  On CPU they run with interpret=True; the
real-TPU behaviour is covered by the bench and by offline lowering (each
kernel's pallas_call lowers for the tpu platform — checked here too).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    _layer_norm,
    _linear,
    _relative_position_index,
    _shift_attn_mask,
    _window_attention,
    _window_partition,
    _window_reverse,
    init_params,
)
from audio_metrics_tpu.ops.attention import swin_attention_block_pallas
from audio_metrics_tpu.ops.mel import (
    log_mel_pallas,
    log_mel_pallas_halo,
    log_mel_spectrogram,
    mel_filter_bank,
)
from audio_metrics_tpu.ops.mlp import mlp_block_pallas

cfg = HTSAT_BASE


def _prep_attention_weights(params, pre, heads, c, window, shift, res):
    d = c // heads
    scale = 1.0 / np.sqrt(d)
    get = lambda k: np.asarray(params[k], np.float32)
    wq = get(f"{pre}.attention.self.query.weight").T.reshape(c, heads, d)
    wq = (wq * scale).transpose(1, 0, 2)
    wk = get(f"{pre}.attention.self.key.weight").T.reshape(c, heads, d).transpose(1, 0, 2)
    wv = get(f"{pre}.attention.self.value.weight").T.reshape(c, heads, d).transpose(1, 0, 2)
    wp = get(f"{pre}.attention.output.dense.weight").T.reshape(heads, d, c)
    bq = get(f"{pre}.attention.self.query.bias").reshape(heads, d) * scale
    bv = get(f"{pre}.attention.self.value.bias").reshape(heads, d)
    bp = get(f"{pre}.attention.output.dense.bias") + np.einsum("hd,hdc->c", bv, wp)
    table = get(f"{pre}.attention.self.relative_position_bias_table")
    idx = _relative_position_index(window).reshape(-1)
    n = window * window
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
    if shift:
        bm = bias[None] + _shift_attn_mask(res, res, window, shift)[:, None]
    else:
        bm = bias[None]
    return tuple(jnp.asarray(a, jnp.float32) for a in (wq, bq, wk, wv, wp, bp, bm))


@pytest.mark.parametrize("stage,shift", [(0, 0), (0, 4), (1, 4), (2, 4), (3, 0)])
def test_attention_block_kernel_matches_xla(stage, shift):
    rng = np.random.default_rng(stage * 10 + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    if res <= window:
        shift = 0
    pre = f"audio_encoder.layers.{stage}.blocks.0"
    B = 4
    x = jnp.asarray(rng.normal(size=(B, res * res, c)).astype(np.float32))

    # XLA reference: the attention half of _swin_block
    sc = x
    hx = _layer_norm(
        x,
        params[f"{pre}.layernorm_before.weight"],
        params[f"{pre}.layernorm_before.bias"],
        cfg.layer_norm_eps,
    ).reshape(B, res, res, c)
    attn_mask = None
    if shift:
        hx = jnp.roll(hx, shift=(-shift, -shift), axis=(1, 2))
        attn_mask = _shift_attn_mask(res, res, window, shift)
    wins = _window_partition(hx, window)
    wins = _window_attention(wins, params, f"{pre}.attention", heads, window, attn_mask)
    hx = _window_reverse(wins, window, res, res)
    if shift:
        hx = jnp.roll(hx, shift=(shift, shift), axis=(1, 2))
    ref = sc + hx.reshape(B, res * res, c)

    wq, bq, wk, wv, wp, bp, bm = _prep_attention_weights(
        params, pre, heads, c, window, shift, res
    )
    out = swin_attention_block_pallas(
        x.reshape(B, res, res, c),
        params[f"{pre}.layernorm_before.weight"].astype(jnp.float32),
        params[f"{pre}.layernorm_before.bias"].astype(jnp.float32),
        wq,
        bq,
        wk,
        wv,
        wp,
        bp,
        bm,
        heads,
        window,
        shift,
        eps=cfg.layer_norm_eps,
        interpret=True,
    ).reshape(B, res * res, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("shift", [0, 4])
def test_merged_window_attention_matches_per_window(shift):
    """Dense whole-image attention with the block-diagonal -1e9 mask
    (htsat._merged_bias_mask, used at stage 2 on TPU) must reproduce
    per-window attention exactly — masked probs underflow to 0.0."""
    from audio_metrics_tpu.models.htsat import _merged_bias_mask

    stage = 2
    rng = np.random.default_rng(42 + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = cfg.window_size
    pre = f"audio_encoder.layers.{stage}.blocks.0"
    B = 2
    x = jnp.asarray(rng.normal(size=(B, res * res, c)).astype(np.float32))

    sc = x
    hx = _layer_norm(
        x,
        params[f"{pre}.layernorm_before.weight"],
        params[f"{pre}.layernorm_before.bias"],
        cfg.layer_norm_eps,
    ).reshape(B, res, res, c)
    attn_mask = None
    if shift:
        hx = jnp.roll(hx, shift=(-shift, -shift), axis=(1, 2))
        attn_mask = _shift_attn_mask(res, res, window, shift)
    wins = _window_partition(hx, window)
    wins = _window_attention(wins, params, f"{pre}.attention", heads, window, attn_mask)
    hx = _window_reverse(wins, window, res, res)
    if shift:
        hx = jnp.roll(hx, shift=(shift, shift), axis=(1, 2))
    ref = sc + hx.reshape(B, res * res, c)

    wq, bq, wk, wv, wp, bp, bm = _prep_attention_weights(
        params, pre, heads, c, window, shift, res
    )
    bm = _merged_bias_mask(bm, res, window)
    assert bm.shape == (1, heads, res * res, res * res)
    out = swin_attention_block_pallas(
        x.reshape(B, res, res, c),
        params[f"{pre}.layernorm_before.weight"].astype(jnp.float32),
        params[f"{pre}.layernorm_before.bias"].astype(jnp.float32),
        wq,
        bq,
        wk,
        wv,
        wp,
        bp,
        bm,
        heads,
        res,  # one dense window spanning the image
        shift,
        eps=cfg.layer_norm_eps,
        interpret=True,
    ).reshape(B, res * res, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_attention_block_kernel_lowers_for_tpu():
    from functools import partial

    from audio_metrics_tpu.ops.attention import _attn_block_call

    x = jnp.zeros((8, 64, 64, 128), jnp.bfloat16)
    ln = jnp.zeros((128,), jnp.float32)
    wq = jnp.zeros((4, 128, 32), jnp.bfloat16)
    bq = jnp.zeros((4, 32), jnp.float32)
    wp = jnp.zeros((4, 32, 128), jnp.bfloat16)
    bp = jnp.zeros((128,), jnp.float32)
    bm = jnp.zeros((64, 4, 64, 64), jnp.float32)
    with jax.enable_x64(False):
        jax.jit(
            partial(_attn_block_call, heads=4, window=8, shift=4, eps=1e-5, interpret=False)
        ).trace(x, ln, ln, wq, bq, wq, wq, wp, bp, bm).lower(lowering_platforms=("tpu",))


def test_mlp_block_kernel_matches_xla():
    rng = np.random.default_rng(7)
    c = 128
    x = jnp.asarray(rng.normal(size=(4, 256, c)).astype(np.float32))
    lnw = jnp.asarray(rng.normal(size=c).astype(np.float32))
    lnb = jnp.asarray(rng.normal(size=c).astype(np.float32))
    w1 = jnp.asarray(rng.normal(scale=0.05, size=(c, 4 * c)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=4 * c).astype(np.float32))
    w2 = jnp.asarray(rng.normal(scale=0.05, size=(4 * c, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=c).astype(np.float32))

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5) * lnw + lnb
    ref = x + (jax.nn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2)

    out = mlp_block_pallas(x, lnw, lnb, w1, b1, w2, b2, gelu="exact", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_gelu_poly_bounded_error():
    """The AM_TPU_GELU=poly multiplier (odd degree-17 polynomial, input
    clamped at 4.5) must stay within its documented envelope vs exact
    erf-GELU over all of R: activation abs err < 1e-4, rel < 3e-4."""
    from audio_metrics_tpu.ops.mlp import gelu_f32

    x = jnp.asarray(np.linspace(-9, 9, 400001).astype(np.float32))
    exact = np.asarray(jax.nn.gelu(x, approximate=False), np.float64)
    poly = np.asarray(gelu_f32(x, "poly"), np.float64)
    err = np.abs(poly - exact)
    assert err.max() < 1e-4, err.max()
    m = np.abs(exact) > 0.1
    assert (err[m] / np.abs(exact[m])).max() < 3e-4


def test_mlp_block_kernel_poly_gelu_close():
    """Kernel output with the polynomial GELU stays within the package's
    1e-4 envelope of the exact-erf kernel (the hidden-tensor error is
    averaged down by fc2 and sub-ULP after the bf16 cast in bf16 mode)."""
    rng = np.random.default_rng(7)
    c = 128
    x = jnp.asarray(rng.normal(size=(4, 256, c)).astype(np.float32))
    lnw = jnp.asarray(rng.normal(size=c).astype(np.float32))
    lnb = jnp.asarray(rng.normal(size=c).astype(np.float32))
    w1 = jnp.asarray(rng.normal(scale=0.05, size=(c, 4 * c)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=4 * c).astype(np.float32))
    w2 = jnp.asarray(rng.normal(scale=0.05, size=(4 * c, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=c).astype(np.float32))

    exact = mlp_block_pallas(x, lnw, lnb, w1, b1, w2, b2, gelu="exact", interpret=True)
    poly = mlp_block_pallas(x, lnw, lnb, w1, b1, w2, b2, gelu="poly", interpret=True)
    # 512 hidden units x ~7e-5 element error, random-walk-summed through
    # fc2 (|w2| ~ 0.05): measured max 1.2e-4 on this fixture
    np.testing.assert_allclose(np.asarray(poly), np.asarray(exact), atol=2e-4)


def test_mlp_block_kernel_int8_close_to_exact():
    """W8A8 dynamic-quant MLP kernel: the quantization error on the MLP
    *branch* (output minus residual) stays within ~2% rms of the exact
    branch.  The kernel is a measured NEGATIVE for speed on v5e at HTSAT
    shapes (see BASELINE.md: the fused MLP is VPU/traffic-bound, so the
    int8 MXU saving is outweighed by the in-kernel quant passes at stages
    0-1); it is kept as the documented decision record."""
    from audio_metrics_tpu.ops.mlp import mlp_block_pallas_int8

    rng = np.random.default_rng(11)
    c = 128
    x = jnp.asarray(rng.normal(size=(4, 256, c)).astype(np.float32))
    lnw = jnp.asarray(rng.normal(1.0, 0.1, size=c).astype(np.float32))
    lnb = jnp.asarray(rng.normal(0.0, 0.1, size=c).astype(np.float32))
    w1 = jnp.asarray(rng.normal(scale=0.09, size=(c, 4 * c)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=4 * c).astype(np.float32))
    w2 = jnp.asarray(rng.normal(scale=0.04, size=(4 * c, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=c).astype(np.float32))

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5) * lnw + lnb
    branch_ref = np.asarray(jax.nn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2)

    out = mlp_block_pallas_int8(x, lnw, lnb, w1, b1, w2, b2, interpret=True)
    branch = np.asarray(out) - np.asarray(x)
    rel = np.linalg.norm(branch - branch_ref) / np.linalg.norm(branch_ref)
    assert rel < 0.02, rel


@pytest.mark.parametrize(
    "conv",
    [
        dict(  # CLAP convention
            sr=48000, frame=1024, hop=480, n_fft=1024, n_mels=64, fmin=50,
            fmax=14000, center=True, norm="slaney", scale="slaney",
            domain="hz", zero_dc=False, log_mode="db",
        ),
        dict(  # VGGish convention
            sr=16000, frame=400, hop=160, n_fft=512, n_mels=64, fmin=125,
            fmax=7500, center=False, norm=None, scale="htk",
            domain="mel", zero_dc=True, log_mode="natural",
        ),
    ],
    ids=["clap", "vggish"],
)
@pytest.mark.parametrize("kernel", ["v1", "halo"])
def test_log_mel_pallas_matches_xla(conv, kernel):
    rng = np.random.default_rng(3)
    a = jnp.asarray((0.2 * rng.normal(size=(3, conv["sr"]))).astype(np.float32))
    ref = log_mel_spectrogram(
        a,
        sampling_rate=conv["sr"],
        frame_length=conv["frame"],
        hop_length=conv["hop"],
        n_mels=conv["n_mels"],
        fmin=conv["fmin"],
        fmax=conv["fmax"],
        n_fft=conv["n_fft"],
        center=conv["center"],
        power=2.0,
        mel_norm=conv["norm"],
        mel_scale=conv["scale"],
        triangle_domain=conv["domain"],
        zero_dc=conv["zero_dc"],
        log_mode=conv["log_mode"],
    )
    fb = mel_filter_bank(
        conv["n_fft"] // 2 + 1,
        conv["n_mels"],
        float(conv["fmin"]),
        float(conv["fmax"]),
        conv["sr"],
        norm=conv["norm"],
        mel_scale=conv["scale"],
        triangle_domain=conv["domain"],
        zero_dc=conv["zero_dc"],
    ).astype(np.float32)
    fn = log_mel_pallas if kernel == "v1" else log_mel_pallas_halo
    out = fn(
        a,
        frame_length=conv["frame"],
        hop_length=conv["hop"],
        n_fft=conv["n_fft"],
        fb=fb,
        center=conv["center"],
        log_mode=conv["log_mode"],
        interpret=True,
    )
    assert out.shape == ref.shape
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # bf16 frame quantization: tiny absolute dB error except at silent bins
    assert np.mean(d) < 0.02
    assert np.max(d) < 0.5


@pytest.mark.parametrize("kernel", ["v1", "halo"])
def test_log_mel_pallas_affine_epilogue(kernel):
    """out_affine/out_dtype epilogue == plain kernel output * s + o cast to
    bf16 (the CLAP BN fold path; models/clap._clap_forward)."""
    rng = np.random.default_rng(5)
    a = jnp.asarray((0.2 * rng.normal(size=(2, 48000))).astype(np.float32))
    fb = mel_filter_bank(
        513, 64, 50.0, 14000.0, 48000, norm="slaney", mel_scale="slaney"
    ).astype(np.float32)
    sc = rng.normal(size=64).astype(np.float32) * 0.3 + 1.0
    of = rng.normal(size=64).astype(np.float32)
    fn = log_mel_pallas if kernel == "v1" else log_mel_pallas_halo
    kw = dict(frame_length=1024, hop_length=480, n_fft=1024, fb=fb,
              center=True, log_mode="db", interpret=True)
    plain = fn(a, **kw)
    fused = fn(a, out_affine=(sc, of), out_dtype=jnp.bfloat16, **kw)
    assert fused.dtype == jnp.bfloat16
    want = (np.asarray(plain) * sc + of).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=0.25,  # one bf16 ulp on dB-scale values
    )


def test_log_mel_xla_affine_epilogue():
    """The XLA path's out_affine/out_dtype must match the same composition."""
    rng = np.random.default_rng(6)
    a = jnp.asarray((0.2 * rng.normal(size=(2, 48000))).astype(np.float32))
    sc = rng.normal(size=64).astype(np.float32) * 0.3 + 1.0
    of = rng.normal(size=64).astype(np.float32)
    kw = dict(sampling_rate=48000, frame_length=1024, hop_length=480,
              n_mels=64, fmin=50, fmax=14000, n_fft=1024, log_mode="db")
    plain = log_mel_spectrogram(a, **kw)
    fused = log_mel_spectrogram(
        a, out_affine=(sc, of), out_dtype=jnp.bfloat16, **kw
    )
    assert fused.dtype == jnp.bfloat16
    want = (np.asarray(plain) * sc + of).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(want, np.float32)
    )


def test_attention_v2_matches_v1():
    """The lane-masked v2 kernel must be numerically equivalent to v1
    (interpret mode; see the v2 docstring for the measured perf verdict)."""
    from audio_metrics_tpu.ops.attention import swin_attention_block_pallas_v2

    stage, shift = 0, 4
    rng = np.random.default_rng(3)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = cfg.window_size
    pre = f"audio_encoder.layers.{stage}.blocks.0"
    jparams = jax.tree.map(jnp.asarray, params)
    wq, bq, wk, wv, wp_h, bp, bm = _prep_attention_weights(
        jparams, pre, heads, c, window, shift, res
    )
    get = lambda k: np.asarray(params[k], np.float32)
    d = c // heads
    scale = 1.0 / np.sqrt(d)
    wqkv = np.concatenate(
        [
            get(f"{pre}.attention.self.query.weight").T * scale,
            get(f"{pre}.attention.self.key.weight").T,
            get(f"{pre}.attention.self.value.weight").T,
        ],
        axis=1,
    )
    bq3 = np.concatenate(
        [get(f"{pre}.attention.self.query.bias") * scale, np.zeros(2 * c, np.float32)]
    )
    wp = get(f"{pre}.attention.output.dense.weight").T

    x = jnp.asarray(rng.normal(size=(2, res, res, c)).astype(np.float32))
    ln_w = jparams[f"{pre}.layernorm_before.weight"].astype(jnp.float32)
    ln_b = jparams[f"{pre}.layernorm_before.bias"].astype(jnp.float32)
    o1 = swin_attention_block_pallas(
        x, ln_w, ln_b, wq, bq, wk, wv, wp_h, bp, bm, heads, window, shift,
        interpret=True,
    )
    o2 = swin_attention_block_pallas_v2(
        x, ln_w, ln_b, jnp.asarray(wqkv, jnp.float32), jnp.asarray(bq3),
        jnp.asarray(wp, jnp.float32), bp, bm, heads=heads, window=window,
        shift=shift, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=5e-5)


@pytest.mark.parametrize("stage,shift", [(0, 4), (2, 0), (2, 4), (3, 0)])
def test_attention_v3_matches_v1(stage, shift):
    """The all-heads-one-matmul v3 kernel must match v1 (interpret mode).

    v3's segmented softmax subtracts the whole-ROW max instead of per-head
    maxima — exact (a per-row constant cancels in each segment's softmax)
    but a different computation path, so parity is asserted per stage
    including shifted (masked) blocks."""
    from audio_metrics_tpu.ops.attention import swin_attention_block_pallas_v3

    rng = np.random.default_rng(7 * stage + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    if res <= window:
        shift = 0
    pre = f"audio_encoder.layers.{stage}.blocks.0"
    jparams = jax.tree.map(jnp.asarray, params)
    wq, bq, wk, wv, wp_h, bp, bm = _prep_attention_weights(
        jparams, pre, heads, c, window, shift, res
    )
    get = lambda k: np.asarray(params[k], np.float32)
    d = c // heads
    scale = 1.0 / np.sqrt(d)
    wqkv = np.concatenate(
        [
            get(f"{pre}.attention.self.query.weight").T * scale,
            get(f"{pre}.attention.self.key.weight").T,
            get(f"{pre}.attention.self.value.weight").T,
        ],
        axis=1,
    )
    bq3 = np.concatenate(
        [get(f"{pre}.attention.self.query.bias") * scale, np.zeros(2 * c, np.float32)]
    )
    wp = get(f"{pre}.attention.output.dense.weight").T

    x = jnp.asarray(rng.normal(size=(2, res, res, c)).astype(np.float32))
    ln_w = jparams[f"{pre}.layernorm_before.weight"].astype(jnp.float32)
    ln_b = jparams[f"{pre}.layernorm_before.bias"].astype(jnp.float32)
    o1 = swin_attention_block_pallas(
        x, ln_w, ln_b, wq, bq, wk, wv, wp_h, bp, bm, heads, window, shift,
        interpret=True,
    )
    o3 = swin_attention_block_pallas_v3(
        x, ln_w, ln_b, jnp.asarray(wqkv, jnp.float32), jnp.asarray(bq3),
        jnp.asarray(wp, jnp.float32), bp, bm, heads=heads, window=window,
        shift=shift, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o1), atol=5e-5)


@pytest.mark.parametrize("stage,shift", [(0, 4), (2, 4), (3, 0)])
def test_swin_block_v4_matches_xla(stage, shift):
    """The v4 whole-block kernel (v3 attention + MLP in one pallas_call)
    must match the XLA _swin_block end to end (interpret mode)."""
    from audio_metrics_tpu.ops.attention import swin_block_pallas_v4
    from audio_metrics_tpu.models.htsat import _swin_block

    rng = np.random.default_rng(11 * stage + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    if res <= window:
        shift = 0
    n = window * window
    d = c // heads
    prefix = f"audio_encoder.layers.{stage}.blocks.0"
    pre = f"{prefix}.attention"
    B = 2
    x = jnp.asarray(rng.normal(size=(B, res * res, c)).astype(np.float32))
    want = _swin_block(x, params, prefix, cfg, res, shift, heads)

    scale = 1.0 / np.sqrt(d)
    wqkv = jnp.concatenate(
        [
            params[f"{pre}.self.query.weight"].T * scale,
            params[f"{pre}.self.key.weight"].T,
            params[f"{pre}.self.value.weight"].T,
        ],
        axis=1,
    ).astype(jnp.float32)
    bq3 = jnp.concatenate(
        [params[f"{pre}.self.query.bias"] * scale, jnp.zeros(2 * c)]
    ).astype(jnp.float32)
    wp = params[f"{pre}.output.dense.weight"].T.astype(jnp.float32)
    wp_h = params[f"{pre}.output.dense.weight"].T.reshape(heads, d, c)
    bv = params[f"{pre}.self.value.bias"].reshape(heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp_h.astype(jnp.float32))
    ).astype(jnp.float32)
    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
    bm = bias[None]
    if shift:
        bm = bm + jnp.asarray(_shift_attn_mask(res, res, window, shift))[:, None]

    v4_args = (
        x.reshape(B, res, res, c),
        params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32),
        wqkv, bq3, wp, bp, bm,
        params[f"{prefix}.layernorm_after.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_after.bias"].astype(jnp.float32),
        params[f"{prefix}.intermediate.dense.weight"].T.astype(jnp.float32),
        params[f"{prefix}.intermediate.dense.bias"].astype(jnp.float32),
        params[f"{prefix}.output.dense.weight"].T.astype(jnp.float32),
        params[f"{prefix}.output.dense.bias"].astype(jnp.float32),
        heads, window, shift,
    )
    # atol: 5e-5 covers interpret mode; the compiled (Mosaic) kernel adds
    # post-scale-softmax reassociation drift (unnormalized exp contracted
    # before the 1/den scale) measured at <=7e-5 abs / 0.5% rel on 0.014%
    # of elements on v5e — far inside the package's bf16-forward envelope.
    got = swin_block_pallas_v4(
        *v4_args, eps=cfg.layer_norm_eps, gelu="exact", interpret=True,
    ).reshape(B, res * res, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # polynomial-GELU flavor: within the package 1e-4 envelope of exact
    got_poly = swin_block_pallas_v4(
        *v4_args, eps=cfg.layer_norm_eps, gelu="poly", interpret=True,
    ).reshape(B, res * res, c)
    np.testing.assert_allclose(np.asarray(got_poly), np.asarray(want), atol=3e-4)

@pytest.mark.parametrize(
    "stage,shift", [(0, 0), (0, 4), (1, 0), (1, 4), (2, 0), (2, 4), (3, 0)]
)
def test_wired_v4_helper_matches_xla(stage, shift):
    """The model-side v4 wiring (_whole_block_pallas_v4: shared
    _v3_kernel_weights prep + swin_block_pallas_v4) must match the XLA
    _swin_block path it replaces at the stages the dispatch table enables
    (default AM_TPU_V4_STAGES="2u,2s,0u,0s,1u,1s")."""
    from audio_metrics_tpu.models.htsat import _swin_block, _whole_block_pallas_v4

    rng = np.random.default_rng(101 + stage + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    prefix = f"audio_encoder.layers.{stage}.blocks.0"
    B = 2
    x = jnp.asarray(rng.normal(size=(B, res * res, c)).astype(np.float32))

    want = _swin_block(x, params, prefix, cfg, res, shift, heads, stage=stage)
    # production default (poly GELU): package 1e-4-class envelope, plus
    # compiled post-scale reassociation headroom (<=7e-5 abs on v5e)
    got = _whole_block_pallas_v4(
        x, params, prefix, cfg, res, shift, heads, window, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)
    # exact-erf flavor: tight structural parity with the XLA block
    import audio_metrics_tpu.ops.mlp as mlp_mod

    orig = mlp_mod.GELU_MODE
    mlp_mod.GELU_MODE = "exact"
    try:
        got = _whole_block_pallas_v4(
            x, params, prefix, cfg, res, shift, heads, window, interpret=True
        )
    finally:
        mlp_mod.GELU_MODE = orig
    # 2e-4: compiled post-scale-softmax reassociation headroom (<=7e-5 abs
    # measured on v5e at stages 1-2); interpret mode stays ~1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("stage,shift", [(0, 4), (1, 4), (2, 0), (2, 4), (3, 0)])
def test_attention_v3_grouped_matches_ungrouped(stage, shift):
    """The 128-lane head-grouped score/context path must match the
    all-heads v3 layout exactly up to matmul summation order (the group
    slices are 128-lane-aligned and softmax stays segment-exact per group;
    stage 0 has C=128 so grouped degenerates to the v3 layout there)."""
    from audio_metrics_tpu.ops.attention import (
        _lane_groups_for,
        swin_attention_block_pallas_v3,
    )

    rng = np.random.default_rng(23 * stage + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    if res <= window:
        shift = 0
    n = window * window
    d = c // heads
    if stage > 0:
        assert _lane_groups_for(heads, d, True) == c // 128
    pre = f"audio_encoder.layers.{stage}.blocks.0.attention"
    scale = 1.0 / np.sqrt(d)
    wqkv = jnp.concatenate(
        [
            params[f"{pre}.self.query.weight"].T * scale,
            params[f"{pre}.self.key.weight"].T,
            params[f"{pre}.self.value.weight"].T,
        ],
        axis=1,
    ).astype(jnp.float32)
    bq3 = jnp.concatenate(
        [params[f"{pre}.self.query.bias"] * scale, jnp.zeros(2 * c)]
    ).astype(jnp.float32)
    wp = params[f"{pre}.output.dense.weight"].T.astype(jnp.float32)
    wp_h = params[f"{pre}.output.dense.weight"].T.reshape(heads, d, c)
    bv = params[f"{pre}.self.value.bias"].reshape(heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp_h.astype(jnp.float32))
    ).astype(jnp.float32)
    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
    bm = bias[None]
    if shift:
        bm = bm + jnp.asarray(_shift_attn_mask(res, res, window, shift))[:, None]

    prefix = f"audio_encoder.layers.{stage}.blocks.0"
    ln_w = params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32)
    ln_b = params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, res, res, c)).astype(np.float32))
    base = swin_attention_block_pallas_v3(
        x, ln_w, ln_b, wqkv, bq3, wp, bp, bm,
        heads=heads, window=window, shift=shift, grouped=False, interpret=True,
    )
    grp = swin_attention_block_pallas_v3(
        x, ln_w, ln_b, wqkv, bq3, wp, bp, bm,
        heads=heads, window=window, shift=shift, grouped=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(grp), np.asarray(base), atol=5e-5)


@pytest.mark.parametrize(
    "stage,shift", [(0, 4), (1, 4), (2, 0), (2, 4), (3, 0)]
)
def test_swin_block_v4_grouped_matches_xla(stage, shift):
    """The v4 whole-block kernel with the head-grouped attention path must
    still match the XLA _swin_block end to end."""
    from audio_metrics_tpu.ops.attention import swin_block_pallas_v4
    from audio_metrics_tpu.models.htsat import _swin_block

    rng = np.random.default_rng(31 * stage + shift)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    if res <= window:
        shift = 0
    n = window * window
    d = c // heads
    prefix = f"audio_encoder.layers.{stage}.blocks.0"
    pre = f"{prefix}.attention"
    B = 2
    x = jnp.asarray(rng.normal(size=(B, res * res, c)).astype(np.float32))
    want = _swin_block(x, params, prefix, cfg, res, shift, heads)

    scale = 1.0 / np.sqrt(d)
    wqkv = jnp.concatenate(
        [
            params[f"{pre}.self.query.weight"].T * scale,
            params[f"{pre}.self.key.weight"].T,
            params[f"{pre}.self.value.weight"].T,
        ],
        axis=1,
    ).astype(jnp.float32)
    bq3 = jnp.concatenate(
        [params[f"{pre}.self.query.bias"] * scale, jnp.zeros(2 * c)]
    ).astype(jnp.float32)
    wp = params[f"{pre}.output.dense.weight"].T.astype(jnp.float32)
    wp_h = params[f"{pre}.output.dense.weight"].T.reshape(heads, d, c)
    bv = params[f"{pre}.self.value.bias"].reshape(heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp_h.astype(jnp.float32))
    ).astype(jnp.float32)
    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
    bm = bias[None]
    if shift:
        bm = bm + jnp.asarray(_shift_attn_mask(res, res, window, shift))[:, None]

    got = swin_block_pallas_v4(
        x.reshape(B, res, res, c),
        params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32),
        wqkv, bq3, wp, bp, bm,
        params[f"{prefix}.layernorm_after.weight"].astype(jnp.float32),
        params[f"{prefix}.layernorm_after.bias"].astype(jnp.float32),
        params[f"{prefix}.intermediate.dense.weight"].T.astype(jnp.float32),
        params[f"{prefix}.intermediate.dense.bias"].astype(jnp.float32),
        params[f"{prefix}.output.dense.weight"].T.astype(jnp.float32),
        params[f"{prefix}.output.dense.bias"].astype(jnp.float32),
        heads, window, shift, eps=cfg.layer_norm_eps, grouped=True,
        gelu="exact", interpret=True,
    ).reshape(B, res * res, c)
    # 2e-4: compiled post-scale reassociation headroom (see the unshifted
    # v4 test above); interpret mode stays ~1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("stage", [0, 1])
def test_attention_v3_bf16_bitcast_roll(stage):
    """The shifted-window roll on bf16 inputs goes through a paired-lane
    int32 bitcast (pltpu.roll wants 32-bit data); a packing/shift bug would
    misalign whole windows (O(1) errors everywhere), so a loose bf16
    tolerance against the f32 kernel discriminates cleanly."""
    from audio_metrics_tpu.ops.attention import swin_attention_block_pallas_v3

    shift = 4
    rng = np.random.default_rng(17 + stage)
    params = init_params(cfg, seed=0)
    for k in list(params):
        if k.endswith(".bias") or "bias_table" in k:
            params[k] = rng.normal(scale=0.5, size=params[k].shape).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)

    res = cfg.grid_size // 2**stage
    c = cfg.embed_dim * 2**stage
    heads = cfg.num_heads[stage]
    window = min(cfg.window_size, res)
    n = window * window
    d = c // heads
    pre = f"audio_encoder.layers.{stage}.blocks.0.attention"
    scale = 1.0 / np.sqrt(d)
    wqkv = jnp.concatenate(
        [
            params[f"{pre}.self.query.weight"].T * scale,
            params[f"{pre}.self.key.weight"].T,
            params[f"{pre}.self.value.weight"].T,
        ],
        axis=1,
    ).astype(jnp.float32)
    bq3 = jnp.concatenate(
        [params[f"{pre}.self.query.bias"] * scale, jnp.zeros(2 * c)]
    ).astype(jnp.float32)
    wp = params[f"{pre}.output.dense.weight"].T.astype(jnp.float32)
    wp_h = params[f"{pre}.output.dense.weight"].T.reshape(heads, d, c)
    bv = params[f"{pre}.self.value.bias"].reshape(heads, d)
    bp = (
        params[f"{pre}.output.dense.bias"]
        + jnp.einsum("hd,hdc->c", bv, wp_h.astype(jnp.float32))
    ).astype(jnp.float32)
    table = params[f"{pre}.self.relative_position_bias_table"].astype(jnp.float32)
    idx = _relative_position_index(window).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
    bm = bias[None] + jnp.asarray(
        _shift_attn_mask(res, res, window, shift)
    )[:, None]

    prefix = f"audio_encoder.layers.{stage}.blocks.0"
    ln_w = params[f"{prefix}.layernorm_before.weight"].astype(jnp.float32)
    ln_b = params[f"{prefix}.layernorm_before.bias"].astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, res, res, c)).astype(np.float32))
    kw = dict(heads=heads, window=window, shift=shift, interpret=True)
    want = swin_attention_block_pallas_v3(
        x, ln_w, ln_b, wqkv, bq3, wp, bp, bm, **kw
    )
    got = swin_attention_block_pallas_v3(
        x.astype(jnp.bfloat16), ln_w, ln_b, wqkv, bq3, wp, bp, bm, **kw
    )
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err < 0.25, err


def test_attention_v4_bf16_compiled_on_chip():
    """Nightly-only (AM_TPU_TEST_REAL=1): compile and EXECUTE the v4
    whole-block kernel with bf16 activations/weights on the real chip.

    The interpret-mode suite cannot see Mosaic lowering failures — in
    particular the bf16-dot-under-``jax_default_matmul_precision="highest"``
    "Bad lhs type" class the round-4 nightly caught for the merge/frontend
    kernels (the nightly conftest sets HIGHEST for its f32 oracles, which is
    exactly the regression condition).  This smoke covers attention.py's
    in-kernel dots: one shifted stage-0 block and one unshifted stage-2
    block (grouped path), executed non-interpret.
    """
    if jax.default_backend() != "tpu":
        pytest.skip("requires real TPU (nightly, AM_TPU_TEST_REAL=1)")
    from audio_metrics_tpu.models.htsat import _whole_block_pallas_v4

    rng = np.random.default_rng(3)
    params = jax.tree.map(jnp.asarray, init_params(cfg, seed=0))
    for stage, shift in ((0, 4), (2, 0)):
        res = cfg.grid_size // 2**stage
        c = cfg.embed_dim * 2**stage
        heads = cfg.num_heads[stage]
        window = min(cfg.window_size, res)
        prefix = f"audio_encoder.layers.{stage}.blocks.0"
        x = jnp.asarray(
            rng.normal(size=(2, res * res, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        out = _whole_block_pallas_v4(
            x, params, prefix, cfg, res, shift, heads, window
        )
        arr = np.asarray(out, np.float32)
        assert arr.shape == (2, res * res, c)
        assert np.isfinite(arr).all()


def test_patch_merge_bf16_compiled_on_chip():
    """Nightly-only: execute patch_merge_pallas compiled (non-interpret)
    with bf16 operands at all three production shapes (64/32/16 res) so a
    Mosaic lowering regression in the merge kernel localizes to this test
    instead of failing inside the bench smoke's full forward."""
    if jax.default_backend() != "tpu":
        pytest.skip("requires real TPU (nightly, AM_TPU_TEST_REAL=1)")
    from audio_metrics_tpu.ops.merge import patch_merge_pallas

    rng = np.random.default_rng(9)
    for h, c in ((64, 128), (32, 256), (16, 512)):
        oc = 2 * c
        x = jnp.asarray(
            rng.standard_normal((2, h * h, c)).astype(np.float32), jnp.bfloat16
        )
        g = jnp.asarray(rng.standard_normal(4 * c), jnp.float32)
        be = jnp.asarray(rng.standard_normal(4 * c), jnp.float32)
        w_io = jnp.asarray(
            0.05 * rng.standard_normal((4 * c, oc)), jnp.float32
        )
        wg = (g[:, None] * w_io).reshape(4, c, oc).astype(jnp.bfloat16)
        out = patch_merge_pallas(
            x, wg, g @ w_io, be @ w_io, h=h, w=h, eps=1e-5
        )
        arr = np.asarray(out, np.float32)
        assert arr.shape == (2, (h // 2) * (h // 2), oc)
        assert np.isfinite(arr).all()


def test_patch_merge_pallas_matches_conv_form(monkeypatch):
    """ops/merge.patch_merge_pallas (one-VMEM-pass quadrant merge) vs the
    XLA conv-form _patch_merging — same folded-LN algebra, so interpret-mode
    parity should be tight f32/bf16 class."""
    from audio_metrics_tpu.models.htsat import _patch_merging
    from audio_metrics_tpu.ops.merge import patch_merge_pallas

    rng = np.random.default_rng(5)
    b, h, c, oc = 3, 8, 128, 256
    n = h * h
    # adversarial: large common-mode offset so a raw-moment var would cancel
    x = (50.0 + rng.standard_normal((b, n, c))).astype(np.float32)
    params = {
        "m.norm.weight": jnp.asarray(rng.standard_normal(4 * c), jnp.float32),
        "m.norm.bias": jnp.asarray(rng.standard_normal(4 * c), jnp.float32),
        "m.reduction.weight": jnp.asarray(
            0.05 * rng.standard_normal((oc, 4 * c)), jnp.float32
        ),
    }
    xb = jnp.asarray(x, jnp.bfloat16)
    # force the XLA conv form for the oracle: on the TPU backend (nightly,
    # AM_TPU_TEST_REAL=1) _patch_merging would otherwise dispatch to the
    # very kernel under test
    with monkeypatch.context() as mp:
        mp.setenv("AM_TPU_NO_FUSED_MERGE", "1")
        want = _patch_merging(xb, params, "m", cfg, h)  # XLA conv form

    g = params["m.norm.weight"].astype(jnp.float32)
    be = params["m.norm.bias"].astype(jnp.float32)
    w_io = params["m.reduction.weight"].T.astype(jnp.float32)
    wg = (g[:, None] * w_io).reshape(4, c, oc)
    got = patch_merge_pallas(
        xb,
        wg.astype(jnp.bfloat16),
        g @ w_io,
        be @ w_io,
        h=h,
        w=h,
        eps=float(cfg.layer_norm_eps),
        interpret=True,
    )
    assert got.shape == want.shape == (b, (h // 2) * (h // 2), oc)
    w32 = np.asarray(want, np.float32)
    g32 = np.asarray(got, np.float32)
    scale = np.abs(w32).max()
    assert scale > 0
    assert np.abs(g32 - w32).max() / scale < 2e-2  # bf16 output quantization
    # and in f32-ish terms via correlation of the two outputs
    assert np.corrcoef(g32.ravel(), w32.ravel())[0, 1] > 0.99999


def test_patch_merge_kernel_lowers_for_tpu():
    from functools import partial

    from audio_metrics_tpu.ops.merge import patch_merge_pallas

    x = jnp.zeros((8, 64 * 64, 128), jnp.bfloat16)
    wg = jnp.zeros((4, 128, 256), jnp.bfloat16)
    sv = jnp.zeros((256,), jnp.float32)
    tv = jnp.zeros((256,), jnp.float32)
    with jax.enable_x64(False):
        jax.jit(
            partial(patch_merge_pallas, h=64, w=64, eps=1e-5, interpret=False)
        ).trace(x, wg, sv, tv).lower(lowering_platforms=("tpu",))
