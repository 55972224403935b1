"""Probe patch-merge variants at a given batch (merge 0 regressed at B=128:
0.74 ms/64-clip equiv vs the 0.17 recorded at B=64 — suspect the f32
materialization of the (b, h, w, c) activations in the LN-stat passes).

Variants:
  conv      — current _patch_merging (f32 xf/xc materialized)
  conv_fused— moments as dtype=f32 reductions straight off the bf16 input
  gather    — the direct-form oracle

Usage: python scripts/probe_merge.py [B] [iters]
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
    _patch_merging,
    _patch_merging_gather,
    init_params,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
cfg = HTSAT_BASE
RES = 64  # stage-0 output resolution (merge 0)
C = cfg.embed_dim  # 128
PREFIX = "audio_encoder.layers.0.downsample"


def _patch_merging_fused(x, params, prefix, cfg, resolution):
    """Same algebra as _patch_merging, but the LN moment passes are
    reductions with f32 accumulation over the bf16 input — no f32 copy of
    the (b, h, w, c) activations is ever materialized."""
    h = w = resolution
    b, _, c = x.shape
    dt = x.dtype
    x4 = x.reshape(b, h, w, c)

    g = params[f"{prefix}.norm.weight"].astype(jnp.float32)
    be = params[f"{prefix}.norm.bias"].astype(jnp.float32)
    w_io = params[f"{prefix}.reduction.weight"].T.astype(jnp.float32)
    oc = w_io.shape[1]
    wg = (g[:, None] * w_io).reshape(4, c, oc)
    ker = jnp.stack(
        [jnp.stack([wg[0], wg[2]], axis=0), jnp.stack([wg[1], wg[3]], axis=0)],
        axis=0,
    )
    svec = g @ w_io
    tvec = be @ w_io

    m1 = jnp.mean(x4, axis=-1, dtype=jnp.float32)
    mu = 0.25 * (
        m1[:, 0::2, 0::2] + m1[:, 1::2, 0::2] + m1[:, 0::2, 1::2] + m1[:, 1::2, 1::2]
    )
    h2, w2 = h // 2, w // 2
    mu_up = jnp.broadcast_to(mu[:, :, None, :, None], (b, h2, 2, w2, 2)).reshape(
        b, h, w
    )
    # centered second pass, fused: convert+sub+square feed the c-reduction
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
        x4,
        ker.astype(dt),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = conv * rs[..., None] + (tvec - (mu * rs)[..., None] * svec)
    return out.reshape(b, h2 * w2, oc).astype(dt)


def main():
    params = {k: jnp.asarray(v) for k, v in init_params(cfg).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, RES * RES, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    variants = {
        "conv": _patch_merging,
        "conv_fused": _patch_merging_fused,
        "gather": _patch_merging_gather,
    }
    outs = {}
    for name, fn in variants.items():
        f = jax.jit(lambda p, x, fn=fn: fn(x, p, PREFIX, cfg, RES))
        o = f(params, x)
        outs[name] = np.asarray(o.astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = f(params, x)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:12s} {dt * 1e3:7.3f} ms / {B} clips")
    ref = outs["gather"]
    for name, o in outs.items():
        err = np.max(np.abs(o - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"{name:12s} rel-max-err vs gather: {err:.2e}")


if __name__ == "__main__":
    main()
