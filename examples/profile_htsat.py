"""Per-stage wall-clock breakdown of the CLAP/HTSAT forward on TPU.

Times (device-resident inputs, scalar-pull sync) each phase of the
flagship-model forward at the bench batch size so optimization work targets
the real bottleneck.  Usage:  python examples/profile_htsat.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from audio_metrics_tpu.models import htsat
from audio_metrics_tpu.models.clap import clap_mel, MAX_SAMPLES
from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    htsat_encode,
    init_params,
    reshape_mel2img,
    _swin_block,
    _patch_merging,
    _layer_norm,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DTYPE = jnp.bfloat16
cfg = HTSAT_BASE


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def bench(fn, *args, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    key = jax.random.PRNGKey(0)
    audio = 0.2 * jax.random.normal(key, (B, MAX_SAMPLES), jnp.float32)
    sync(audio)

    # --- mel frontend
    mel_fn = jax.jit(clap_mel)
    t_mel, mel = bench(mel_fn, audio)
    print(f"mel frontend            {1e3 * t_mel:8.2f} ms  {mel.shape}")

    # --- frontend: batchnorm + reshape2img + patch embed
    @jax.jit
    def frontend(params, mel):
        mean = params["audio_encoder.batch_norm.running_mean"]
        var = params["audio_encoder.batch_norm.running_var"]
        gamma = params["audio_encoder.batch_norm.weight"]
        beta = params["audio_encoder.batch_norm.bias"]
        m = (mel - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        x = reshape_mel2img(m, cfg).astype(DTYPE)
        w = params["audio_encoder.patch_embed.proj.weight"].astype(DTYPE)
        b = params["audio_encoder.patch_embed.proj.bias"]
        x = jax.lax.conv_general_dilated(
            x, w, (cfg.patch_stride, cfg.patch_stride), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ) + b[None, :, None, None]
        x = x.astype(DTYPE)
        bsz, c, gh, gw = x.shape
        x = x.reshape(bsz, c, gh * gw).transpose(0, 2, 1)
        return _layer_norm(
            x,
            params["audio_encoder.patch_embed.norm.weight"],
            params["audio_encoder.patch_embed.norm.bias"],
            cfg.layer_norm_eps,
        )

    t_fe, x0 = bench(frontend, params, mel)
    print(f"frontend (bn+img+patch) {1e3 * t_fe:8.2f} ms  {x0.shape}")

    # --- each swin stage
    def make_stage(i, resolution):
        @jax.jit
        def stage(params, x):
            for j in range(cfg.depths[i]):
                shift = 0 if j % 2 == 0 else cfg.window_size // 2
                x = _swin_block(
                    x, params, f"audio_encoder.layers.{i}.blocks.{j}", cfg,
                    resolution, shift, cfg.num_heads[i],
                )
            if i < len(cfg.depths) - 1:
                x = _patch_merging(
                    x, params, f"audio_encoder.layers.{i}.downsample", cfg, resolution
                )
            return x

        return stage

    x = x0
    resolution = cfg.grid_size
    t_total_stages = 0.0
    for i in range(len(cfg.depths)):
        stage_fn = make_stage(i, resolution)
        t_s, x = bench(stage_fn, params, x)
        t_total_stages += t_s
        print(
            f"stage {i} (d={cfg.depths[i]:2d}, r={resolution:3d}, "
            f"C={cfg.embed_dim * 2**i:4d}) {1e3 * t_s:8.2f} ms  {x.shape}"
        )
        if i < len(cfg.depths) - 1:
            resolution //= 2

    # --- full forward for reference
    full = jax.jit(lambda p, m: htsat_encode(p, m, cfg, compute_dtype=DTYPE))
    t_full, _ = bench(full, params, mel)
    print(f"sum of stages           {1e3 * t_total_stages:8.2f} ms")
    print(f"full htsat_encode       {1e3 * t_full:8.2f} ms")
    print(f"-> {B / t_full:.0f} clips/s (encode only, B={B})")


if __name__ == "__main__":
    main()
