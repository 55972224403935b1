"""Is int8 matmul actually ~2x bf16 on this chip (v5e: 394 int8 TOPS vs
197 bf16 TFLOPs), at the shapes the HTSAT stage-2 MLP uses?

Method: time (R, k*C) @ (k*C, 4C) for k in {1, 9} and take the slope —
widening the contraction dim adds pure MXU work with NO extra vector ops
or output traffic (the k-wide matmul IS the sum of k (R,C)@(C,4C)
matmuls, accumulated inside the MXU), so the slope isolates matmul
throughput from relay/dispatch/requant noise.  Decision probe for an
opt-in quantized forward path.
"""

import sys
import time

import os
# Run directly via `python scripts/...` without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend - see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = int(sys.argv[1]) if len(sys.argv) > 1 else 16384  # stage-2 rows at B=64
C = 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def bench(fn, *args, n=N):
    out = fn(*args)
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def slope(dtype, acc_dtype):
    rng = np.random.default_rng(0)

    def run(k):
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-127, 127, size=(R, k * C)), dtype)
            w = jnp.asarray(rng.integers(-127, 127, size=(k * C, 4 * C)), dtype)
        else:
            x = jnp.asarray(rng.normal(size=(R, k * C)), dtype)
            w = jnp.asarray(rng.normal(size=(k * C, 4 * C)), dtype)
        fn = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=acc_dtype))
        return bench(fn, x, w)

    return (run(9) - run(1)) / 8


def main():
    ops = 2 * R * C * 4 * C  # one (R,C)@(C,4C) worth of MACs*2
    tb = slope(jnp.bfloat16, jnp.float32)
    print(f"bf16 : {1e3 * tb:7.3f} ms/Cslab  {ops / tb / 1e12:6.1f} TF/s", flush=True)
    ti = slope(jnp.int8, jnp.int32)
    print(f"int8 : {1e3 * ti:7.3f} ms/Cslab  {ops / ti / 1e12:6.1f} TOP/s", flush=True)
    print(f"ratio: {tb / ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
