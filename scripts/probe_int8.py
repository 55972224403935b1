"""Is int8 matmul actually ~2x bf16 on this chip (v5e: 394 int8 TOPS vs
197 bf16 TFLOPs), at the shapes the HTSAT stage-2 MLP uses?

Times k-in-jit chained matmuls (relay-overhead-free slope) for bf16 vs
int8(->int32) at (rows, C) @ (C, 4C): the decision probe for an opt-in
quantized forward path.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16384  # stage-2 B=64
C = 512


def bench(fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
    return (time.perf_counter() - t0) / n


def slope(make, *args):
    return (bench(make(9), *args) - bench(make(1), *args)) / 8


def main():
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(ROWS, C)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(C, 4 * C)), jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(4 * C, C)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, size=(ROWS, C)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, size=(C, 4 * C)), jnp.int8)
    w2i = jnp.asarray(rng.integers(-127, 127, size=(4 * C, C)), jnp.int8)

    def make_bf16(k):
        @jax.jit
        def fn(x, w1, w2):
            for _ in range(k):
                h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
                x = jnp.dot(
                    h.astype(jnp.bfloat16), w2,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            return x

        return fn

    def make_int8(k):
        @jax.jit
        def fn(x, w1, w2):
            for _ in range(k):
                h = jnp.dot(x, w1, preferred_element_type=jnp.int32)
                # re-narrow like a dynamic requant would
                x = jnp.dot(
                    (h >> 8).astype(jnp.int8), w2,
                    preferred_element_type=jnp.int32,
                )
                x = (x >> 8).astype(jnp.int8)
            return x

        return fn

    flops = 2 * ROWS * C * 4 * C * 2  # two matmuls per iteration
    tb = slope(make_bf16, xb, wb, w2b)
    print(f"bf16 : {1e3 * tb:7.3f} ms/iter  {flops / tb / 1e12:6.1f} TF/s", flush=True)
    ti = slope(make_int8, xi, wi, w2i)
    print(f"int8 : {1e3 * ti:7.3f} ms/iter  {flops / ti / 1e12:6.1f} TOP/s", flush=True)
    print(f"ratio: {tb / ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
