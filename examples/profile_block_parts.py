"""Attention-part vs MLP-part per-block cost for each swin stage.

The axon relay adds ~5 ms fixed overhead per dispatch, so naive one-call
timings are useless.  Instead each probe jit runs the block part k times
(unrolled) and the per-block cost is the k=5 vs k=1 slope.
Usage: python examples/profile_block_parts.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

from audio_metrics_tpu.models.htsat import (
    HTSAT_BASE,
    init_params,
    _layer_norm,
    _linear,
    _window_partition,
    _window_reverse,
    _window_attention,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DTYPE = jnp.bfloat16
cfg = HTSAT_BASE
K_LO, K_HI = 1, 5


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def bench(fn, *args, n=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def slope(make_fn, params, x):
    t_lo = bench(make_fn(K_LO), params, x)
    t_hi = bench(make_fn(K_HI), params, x)
    return (t_hi - t_lo) / (K_HI - K_LO)


def main():
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    key = jax.random.PRNGKey(0)

    resolution = cfg.grid_size
    for i, depth in enumerate(cfg.depths):
        c = cfg.embed_dim * 2**i
        n_tok = resolution * resolution
        x = jax.random.normal(key, (B, n_tok, c), DTYPE)
        sync(x)
        prefix = f"audio_encoder.layers.{i}.blocks.0"
        heads = cfg.num_heads[i]
        window = min(cfg.window_size, resolution)
        res = resolution

        def attn_once(params, x):
            shortcut = x
            h = _layer_norm(
                x,
                params[f"{prefix}.layernorm_before.weight"],
                params[f"{prefix}.layernorm_before.bias"],
                cfg.layer_norm_eps,
            )
            h = h.reshape(B, res, res, c)
            wins = _window_partition(h, window)
            wins = _window_attention(
                wins, params, f"{prefix}.attention", heads, window, None
            )
            h = _window_reverse(wins, window, res, res).reshape(B, res * res, c)
            return shortcut + h

        def mlp_once(params, x):
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

        def make(once):
            def build(k):
                @jax.jit
                def fn(params, x):
                    for _ in range(k):
                        x = once(params, x)
                    return x

                return fn

            return build

        t_a = slope(make(attn_once), params, x)
        t_m = slope(make(mlp_once), params, x)
        print(
            f"stage {i} (r={resolution:3d}, C={c:4d}, h={heads:2d}): "
            f"attn {1e3 * t_a:6.2f} ms/blk   mlp {1e3 * t_m:6.2f} ms/blk   "
            f"stage total (x{depth}): {1e3 * (t_a + t_m) * depth:6.1f} ms"
        )
        if i < len(cfg.depths) - 1:
            resolution //= 2


if __name__ == "__main__":
    main()
