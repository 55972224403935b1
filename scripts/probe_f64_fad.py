"""Probe: device-resident FAD tail feasibility on TPU.

Times the f64-emulated pieces FAD needs on device at d=512 — Cholesky,
the similarity transform matmuls, and the Newton-Schulz trace-sqrtm — and
checks the NS result against the host f64 eigh oracle.  If the device path
is fast AND ~f64-accurate, the evaluate() tail can stop pulling the (d, d)
covariance to host entirely (1 MB ~= 37 ms on the dev relay).

Usage: python scripts/probe_f64_fad.py [d] [iters]
"""

import sys
import time

import os
# Run directly via `python scripts/...` without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend - see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import audio_metrics_tpu  # noqa: F401  (x64 enabled at import)
import jax
import jax.numpy as jnp

from audio_metrics_tpu.metrics.fad import _trace_sqrtm_product_ns, trace_sqrtm_product

D = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / ITERS, out


def main():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4 * D, D))
    b = rng.normal(size=(4 * D, D))
    sx = (a.T @ a) / (4 * D)
    sy = (b.T @ b) / (4 * D)
    print("backend:", jax.default_backend(), " x64:", jax.config.jax_enable_x64)

    sx_d = jnp.asarray(sx)  # f64 under x64
    sy_d = jnp.asarray(sy)
    print("device dtype:", sx_d.dtype)

    t, _ = timed(jax.jit(lambda x: jnp.linalg.cholesky(x)), sx_d)
    print(f"cholesky f64  {t * 1e3:8.2f} ms")
    t, _ = timed(jax.jit(lambda x, y: x @ y), sx_d, sy_d)
    print(f"matmul  f64   {t * 1e3:8.2f} ms")

    ns_jit = jax.jit(lambda x, y: _trace_sqrtm_product_ns(x, y))
    t, out = timed(ns_jit, sx_d, sy_d)
    ref = trace_sqrtm_product(sx, sy)
    err = abs(float(out) - ref) / abs(ref)
    print(f"NS trace-sqrtm {t * 1e3:7.2f} ms   rel err vs host eigh: {err:.2e}")

    # ill-conditioned case: low-rank-ish covariance
    c = rng.normal(size=(D // 8, D))
    sz = (c.T @ c) / (D // 8) + 1e-8 * np.eye(D)
    t, out = timed(ns_jit, sx_d, jnp.asarray(sz))
    ref = trace_sqrtm_product(sx, sz)
    err = abs(float(out) - ref) / abs(ref)
    print(f"NS ill-cond    {t * 1e3:7.2f} ms   rel err vs host eigh: {err:.2e}")


if __name__ == "__main__":
    main()
