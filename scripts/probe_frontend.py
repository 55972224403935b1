"""Attribute the frontend phase (bn + time-interp + patch tokens) at batch B
and probe interp variants:

  dense_f32  — current: (1024, 1001) bicubic matrix as one f32 matmul
  dense_bf16 — same matmul with bf16 operands (f32 accumulate)
  tap4_f32   — 4-tap banded form: gather 4 time rows + weighted sum (f32)

Usage: python scripts/probe_frontend.py [B] [iters]
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
from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    _bicubic_matrix,
    frontend_tokens,
    init_params,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
cfg = HTSAT_BASE
T, F = 1001, 64
SPEC_W = cfg.spec_size * cfg.freq_ratio


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    return (time.perf_counter() - t0) / ITERS, out


def main():
    params = {k: jnp.asarray(v) for k, v in init_params(cfg).items()}
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32) - 4.0)

    w = _bicubic_matrix(T, SPEC_W)  # (1024, 1001)

    # 4-tap banded decomposition of the bicubic matrix
    nz = np.argsort(-np.abs(w), axis=1)[:, :4]
    nz.sort(axis=1)
    coef = np.take_along_axis(w, nz, axis=1)
    dense_err = np.abs(
        w - np.zeros_like(w)
    ).sum() - np.abs(coef).sum()  # sanity: how much mass outside 4 taps
    print(f"bicubic matrix: {w.shape}, mass outside 4 taps per row ~ "
          f"{np.max(np.sum(np.abs(w), axis=1) - np.sum(np.abs(coef), axis=1)):.2e}")

    wd = jnp.asarray(w)
    idx = jnp.asarray(nz)
    cf = jnp.asarray(coef.astype(np.float32))

    @jax.jit
    def dense_f32(mel):
        return jnp.einsum("ot,btf->bof", wd, mel, preferred_element_type=jnp.float32)

    @jax.jit
    def dense_bf16(mel):
        return jnp.einsum(
            "ot,btf->bof",
            wd.astype(jnp.bfloat16),
            mel.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def tap4_f32(mel):
        g = jnp.take(mel, idx.reshape(-1), axis=1).reshape(B, SPEC_W, 4, F)
        return jnp.einsum("bokf,ok->bof", g, cf, preferred_element_type=jnp.float32)

    @jax.jit
    def full_frontend(p, mel):
        m = (mel - p["audio_encoder.batch_norm.running_mean"]) * jax.lax.rsqrt(
            p["audio_encoder.batch_norm.running_var"] + 1e-5
        ) * p["audio_encoder.batch_norm.weight"] + p["audio_encoder.batch_norm.bias"]
        return frontend_tokens(p, m, cfg, jnp.bfloat16)

    t, ref = timed(dense_f32, mel)
    print(f"interp dense_f32  {t * 1e3:7.3f} ms / {B} clips")
    ref = np.asarray(ref)
    for name, fn in (("dense_bf16", dense_bf16), ("tap4_f32", tap4_f32)):
        t, out = timed(fn, mel)
        err = np.max(np.abs(np.asarray(out) - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"interp {name:10s} {t * 1e3:7.3f} ms / {B} clips  rel-max-err {err:.2e}")
    t, _ = timed(full_frontend, params, mel)
    print(f"full frontend     {t * 1e3:7.3f} ms / {B} clips")


if __name__ == "__main__":
    main()
