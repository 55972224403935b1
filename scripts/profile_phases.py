"""Batch-slope ledger of every phase of the CLAP forward.

One-dispatch timings through the dev relay carry ~6 ms fixed overhead, so
each phase is timed at batch B and 3B (n queued calls, one trailing sync)
and reported as the MARGINAL cost per B clips: (t(3B) - t(B)) / 2.  The
fixed dispatch cost cancels, and every phase — including the
shape-changing ones (merges, frontend, tail) the k-repeat probes can't
express — gets the same methodology.

Usage:  python scripts/profile_phases.py [B] [iters]
"""

import os
import sys
import time

# Run directly via `python scripts/...` without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend - see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401
from audio_metrics_tpu.models import htsat as H
from audio_metrics_tpu.models.clap import _clap_forward, clap_mel_tiled
from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    _layer_norm,
    _patch_merging,
    _swin_block,
    init_params,
    reshape_mel2img,
    htsat_encode,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
DT = jnp.bfloat16
cfg = HTSAT_BASE
CLIP = 240_000  # 5 s @ 48 kHz


def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "ravel")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def timed(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS


def slope(fn, args_lo, args_hi):
    # the relay adds multi-ms hiccups; alternate lo/hi three times and use
    # the min of each so a slow patch can't produce a bogus (even negative)
    # difference
    lows, highs = [], []
    for _ in range(3):
        lows.append(timed(fn, *args_lo))
        highs.append(timed(fn, *args_hi))
    return (min(highs) - min(lows)) / 2.0


def main():
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    rng = np.random.default_rng(0)
    nf = cfg.num_features
    params["audio_projection.linear1.weight"] = jnp.asarray(
        rng.normal(scale=0.02, size=(512, nf)).astype(np.float32)
    )
    params["audio_projection.linear1.bias"] = jnp.zeros(512, jnp.float32)
    params["audio_projection.linear2.weight"] = jnp.asarray(
        rng.normal(scale=0.02, size=(512, 512)).astype(np.float32)
    )
    params["audio_projection.linear2.bias"] = jnp.zeros(512, jnp.float32)
    key = jax.random.PRNGKey(0)
    audio = {}
    for b in (B, 3 * B):
        audio[b] = 0.2 * jax.random.normal(key, (b, CLIP), jnp.float32)
        sync(audio[b])

    ledger = []

    def phase(name, fn, inputs):
        t = slope(fn, (params, inputs[B]), (params, inputs[3 * B]))
        ledger.append((name, t))
        print(f"{name:28s} {1e3 * t:8.3f} ms / {B} clips", flush=True)
        return {b: fn(params, inputs[b]) for b in (B, 3 * B)}

    # --- mel (tiled repeat-pad path with the folded BN epilogue + bf16
    # output, as wired for 5 s windows in _clap_forward)
    @jax.jit
    def mel_fn(p, a):
        s = p["audio_encoder.batch_norm.weight"] * jax.lax.rsqrt(
            p["audio_encoder.batch_norm.running_var"] + 1e-5
        )
        o = p["audio_encoder.batch_norm.bias"] - p[
            "audio_encoder.batch_norm.running_mean"
        ] * s
        return clap_mel_tiled(
            a, compute_dtype=DT, out_affine=(s, o), out_dtype=DT
        )

    mel = phase("mel (tiled+bn)", mel_fn, audio)

    # --- frontend: time-interp + patch embed + LN (BN now rides the mel)
    x = phase(
        "frontend",
        jax.jit(lambda p, m: H.frontend_tokens(p, m, cfg, DT)),
        mel,
    )

    # --- stages + merges
    resolution = cfg.grid_size
    for i in range(len(cfg.depths)):

        def stage_fn(p, x, i=i, resolution=resolution):
            for j in range(cfg.depths[i]):
                shift = 0 if j % 2 == 0 else cfg.window_size // 2
                x = _swin_block(
                    x,
                    p,
                    f"audio_encoder.layers.{i}.blocks.{j}",
                    cfg,
                    resolution,
                    shift,
                    cfg.num_heads[i],
                    stage=i,
                )
            return x

        x = phase(f"stage {i} (x{cfg.depths[i]})", jax.jit(stage_fn), x)
        if i < len(cfg.depths) - 1:

            def merge_fn(p, x, i=i, resolution=resolution):
                return _patch_merging(
                    x, p, f"audio_encoder.layers.{i}.downsample", cfg, resolution
                )

            x = phase(f"merge {i}", jax.jit(merge_fn), x)
            resolution //= 2

    # --- tail: final LN + token-semantic regroup + mean pool
    res_final = resolution

    @jax.jit
    def tail(p, x):
        x = _layer_norm(
            x,
            p["audio_encoder.norm.weight"],
            p["audio_encoder.norm.bias"],
            cfg.layer_norm_eps,
        )
        bsz, n, c = x.shape
        x = x.transpose(0, 2, 1).reshape(bsz, c, res_final, res_final)
        c_freq_bin = res_final // cfg.freq_ratio
        x = x.reshape(bsz, c, res_final // c_freq_bin, c_freq_bin, res_final)
        x = x.transpose(0, 1, 3, 2, 4).reshape(bsz, c, -1)
        return x.astype(jnp.float32).mean(axis=-1)

    latent = phase("tail (LN+regroup+pool)", tail, x)

    # --- projection head
    @jax.jit
    def proj(p, latent):
        l1 = (
            jnp.dot(
                latent,
                p["audio_projection.linear1.weight"].T,
                preferred_element_type=jnp.float32,
            )
            + p["audio_projection.linear1.bias"]
        )
        l2 = (
            jnp.dot(
                jax.nn.relu(l1),
                p["audio_projection.linear2.weight"].T,
                preferred_element_type=jnp.float32,
            )
            + p["audio_projection.linear2.bias"]
        )
        return l2 / jnp.linalg.norm(l2, axis=-1, keepdims=True)

    phase("projection", proj, latent)

    total = sum(t for _, t in ledger)
    print(f"{'sum of phases':28s} {1e3 * total:8.3f} ms / {B} clips")

    # --- full forward slopes for comparison
    full = jax.jit(lambda p, a: _clap_forward(p, a, cfg, compute_dtype=DT))
    t_full = slope(full, (params, audio[B]), (params, audio[3 * B]))
    print(f"{'full clap forward (slope)':28s} {1e3 * t_full:8.3f} ms / {B} clips")
    enc = jax.jit(lambda p, m: htsat_encode(p, m, cfg, compute_dtype=DT))
    t_enc = slope(enc, (params, mel[B]), (params, mel[3 * B]))
    print(f"{'htsat_encode (slope)':28s} {1e3 * t_enc:8.3f} ms / {B} clips")


if __name__ == "__main__":
    main()
