"""Parity tests for the fused audio->tokens CLAP frontend kernel.

ops/frontend_fused.clap_tokens_fused performs the whole
mel -> BatchNorm -> bicubic interp -> patchify -> patch-embed -> LayerNorm
chain in one pallas_call.  Its oracle is the unfused composition the bf16
forward otherwise runs: clap_mel_tiled (BN folded into the mel epilogue,
bf16 out) -> models/htsat.frontend_tokens.  Interpret mode on CPU; the
real-TPU behaviour is covered by the bench and the offline TPU lowering
check below (same convention as tests/test_pallas_model_kernels.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_metrics_tpu.models.clap import (
    _FMAX,
    _FMIN,
    _N_FFT,
    _N_MELS,
    SAMPLE_RATE,
    clap_mel_tiled,
)
from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    frontend_tokens,
    init_params,
)
from audio_metrics_tpu.ops.frontend_fused import (
    clap_tokens_fused,
    fused_frontend_supported,
)
from audio_metrics_tpu.ops.mel import mel_filter_bank

cfg = HTSAT_BASE


def _bn_affine(params):
    s = np.asarray(params["audio_encoder.batch_norm.weight"]) / np.sqrt(
        np.asarray(params["audio_encoder.batch_norm.running_var"]) + 1e-5
    )
    o = (
        np.asarray(params["audio_encoder.batch_norm.bias"])
        - np.asarray(params["audio_encoder.batch_norm.running_mean"]) * s
    )
    return s.astype(np.float32), o.astype(np.float32)


def _fused_kwargs(params, interpret):
    fb_np = mel_filter_bank(
        _N_FFT // 2 + 1, _N_MELS, float(_FMIN), float(_FMAX), SAMPLE_RATE,
        norm="slaney", mel_scale="slaney",
    ).astype(np.float32)
    bn_s, bn_o = _bn_affine(params)
    ps = cfg.patch_size
    return dict(
        sr=SAMPLE_RATE,
        cfg=cfg,
        fb_matrix=fb_np,
        bn_scale=jnp.asarray(bn_s),
        bn_offset=jnp.asarray(bn_o),
        patch_w=jnp.asarray(
            np.asarray(params["audio_encoder.patch_embed.proj.weight"])
            .reshape(-1, ps * ps)
            .T
        ),
        patch_b=jnp.asarray(params["audio_encoder.patch_embed.proj.bias"]),
        ln_w=jnp.asarray(params["audio_encoder.patch_embed.norm.weight"]),
        ln_b=jnp.asarray(params["audio_encoder.patch_embed.norm.bias"]),
        interpret=interpret,
    )


def _random_params(seed):
    rng = np.random.default_rng(seed)
    params = init_params(cfg, seed=0)
    # make BatchNorm / LayerNorm / bias paths non-trivial
    d = _N_MELS
    params["audio_encoder.batch_norm.running_mean"] = rng.normal(
        scale=2.0, size=d
    ).astype(np.float32)
    params["audio_encoder.batch_norm.running_var"] = rng.uniform(
        0.5, 3.0, size=d
    ).astype(np.float32)
    params["audio_encoder.batch_norm.weight"] = rng.normal(
        loc=1.0, scale=0.2, size=d
    ).astype(np.float32)
    params["audio_encoder.batch_norm.bias"] = rng.normal(size=d).astype(
        np.float32
    )
    c = cfg.embed_dim
    params["audio_encoder.patch_embed.proj.bias"] = rng.normal(
        scale=0.3, size=c
    ).astype(np.float32)
    params["audio_encoder.patch_embed.norm.weight"] = rng.normal(
        loc=1.0, scale=0.1, size=c
    ).astype(np.float32)
    params["audio_encoder.patch_embed.norm.bias"] = rng.normal(
        scale=0.3, size=c
    ).astype(np.float32)
    return params


def test_fused_frontend_supported_predicate():
    five_s = 5 * SAMPLE_RATE
    assert fused_frontend_supported(five_s, SAMPLE_RATE, cfg)
    assert fused_frontend_supported(2 * SAMPLE_RATE, SAMPLE_RATE, cfg)
    # 10 s exactly: not a repeat-pad clip
    assert not fused_frontend_supported(10 * SAMPLE_RATE, SAMPLE_RATE, cfg)
    # not a whole number of tiles
    assert not fused_frontend_supported(3 * SAMPLE_RATE, SAMPLE_RATE, cfg)
    # not a hop multiple
    assert not fused_frontend_supported(five_s + 1, SAMPLE_RATE, cfg)


def test_clap_tokens_fused_matches_unfused():
    params = _random_params(11)
    jparams = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(3)
    b, n = 2, 5 * SAMPLE_RATE
    audio = jnp.asarray((0.2 * rng.normal(size=(b, n))).astype(np.float32))

    bn_s, bn_o = _bn_affine(params)
    mel = clap_mel_tiled(
        audio,
        compute_dtype=jnp.bfloat16,
        out_affine=(jnp.asarray(bn_s), jnp.asarray(bn_o)),
        out_dtype=jnp.bfloat16,
    )
    ref = frontend_tokens(jparams, mel, cfg, jnp.bfloat16)

    out = clap_tokens_fused(audio, **_fused_kwargs(params, interpret=True))
    assert out.shape == ref.shape == (b, cfg.grid_size**2, cfg.embed_dim)
    assert out.dtype == jnp.bfloat16
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    # bf16 rounding at the LN input (the oracle casts tok to bf16 before LN,
    # the kernel normalizes in f32) plus bf16 mel/interp accumulation-order
    # noise; post-LN values are O(1)
    assert np.mean(np.abs(o - r)) < 0.01, np.mean(np.abs(o - r))
    assert np.max(np.abs(o - r)) < 0.12, np.max(np.abs(o - r))


def test_clap_tokens_fused_lowers_for_tpu():
    params = _random_params(5)
    b, n = 2, 5 * SAMPLE_RATE
    audio = jnp.zeros((b, n), jnp.float32)
    kw = _fused_kwargs(params, interpret=False)
    with jax.enable_x64(False):
        jax.jit(lambda a: clap_tokens_fused(a, **kw)).trace(audio).lower(
            lowering_platforms=("tpu",)
        )
