"""Probe: can the FAD evaluate-tail move fully on-device?

Current evaluate tail (BASELINE.md round-3 rows): the candidate's (d, d)
f32 moment is pulled packed (~19 ms of the pipeline stage through the
27 MB/s relay) and the FAD thread spends ~33 ms of host math per evaluate
(two 512^3 f64 gemms for M = L^T C L + eigvalsh) on the single-core host.

Alternative: compute M = L^T C L on device (f32, HIGHEST precision — the
MXU does 512^3 in ~us) and either
  (a) pull M packed (same 19 ms transfer, host work drops to eigvalsh), or
  (b) also run eigvalsh ON DEVICE (f32 QDWH) and pull only the 512
      eigenvalues (~2 KB): the pipeline loses the whole moment pull.

This probe measures, on the real TPU:
  1. transform slope: M = L^T C L (f32 HIGHEST) per-call cost
  2. device eigvalsh(512) f32 slope  (QDWH — matmul-rich, MXU-friendly)
  3. accuracy of sum(sqrt(clip(eigvals))) for (transform f32 [+ eigh f32])
     vs the all-host f64 oracle, on a full-rank and a low-rank candidate
  4. the packed-M pull time for comparison

Run: python scripts/probe_fad_device.py   (real TPU, warm relay)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import numpy as np

import audio_metrics_tpu  # noqa: F401  (enables x64; selects TPU backend)
import jax

if os.environ.get("AM_PROBE_CPU"):  # accuracy-only dry run on the host
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

D = 512


def _sync(x):
    # block_until_ready is unreliable through the relay (CLAUDE.md): force
    # a scalar transfer
    return float(jnp.sum(x))


def _slope(fn, arg, iters=30, burn=5):
    """Per-call seconds via a queued-dispatch loop slope (amortizes the
    relay's fixed per-dispatch overhead)."""
    out = arg
    for _ in range(burn):
        out = fn(out)
    _sync(out)
    t0 = time.perf_counter()
    out = arg
    for _ in range(iters):
        out = fn(out)
    _sync(out)
    hi = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = arg
    for _ in range(iters // 3):
        out = fn(out)
    _sync(out)
    lo = time.perf_counter() - t0
    return (hi - lo) / (iters - iters // 3)


def _host_trace_sqrt(cov_x64, cov_y64):
    l = np.linalg.cholesky(cov_y64)
    m = l.T @ cov_x64 @ l
    vals = np.linalg.eigvalsh(m)
    return float(np.sqrt(np.clip(vals, 0.0, None)).sum())


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0)

    def make_cov(n, decay):
        # embedding-like spectrum: decaying principal directions
        a = rng.standard_normal((D, D)) * (decay ** np.arange(D))[None, :]
        e = rng.standard_normal((n, D)).astype(np.float32) @ a.astype(np.float32)
        e64 = e.astype(np.float64)
        c = e64 - e64.mean(0)
        return e.astype(np.float32), (c.T @ c) / (n - 1)

    _, cov_ref64 = make_cov(2048, 0.99)
    l64 = np.linalg.cholesky(cov_ref64)
    l_dev = jnp.asarray(l64, dtype=jnp.float32)

    cases = {
        "full_rank_n2048": make_cov(2048, 0.99),
        "ill_cond_n2048": make_cov(2048, 0.97),
        "low_rank_n300": make_cov(300, 0.99),
    }

    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def transform(c32):
        m = jnp.dot(l_dev.T, jnp.dot(c32, l_dev, precision=hi), precision=hi)
        return 0.5 * (m + m.T)

    @jax.jit
    def dev_eigvals(m):
        return jnp.linalg.eigvalsh(m)

    @jax.jit
    def dev_trace_sqrt(m):
        v = jnp.linalg.eigvalsh(m)
        return jnp.sum(jnp.sqrt(jnp.clip(v, 0.0, None)))

    @jax.jit
    def dev_trace_sqrt_ns(m, n_iter=30):
        # coupled Newton-Schulz on the normalized PSD matrix (matmuls only)
        eye = jnp.eye(D, dtype=m.dtype)
        norm = jnp.sqrt(jnp.sum(m * m)) + 1e-30
        a = m / norm
        def body(carry, _):
            y, z = carry
            t = 0.5 * (3.0 * eye - jnp.dot(z, y, precision=hi))
            return (jnp.dot(y, t, precision=hi), jnp.dot(t, z, precision=hi)), None
        (y, _), _ = jax.lax.scan(body, (a, eye), None, length=n_iter)
        return jnp.sqrt(norm) * jnp.trace(y)

    # --- accuracy ----------------------------------------------------
    for name, (e32, cov64) in cases.items():
        n = e32.shape[0]
        e_dev = jnp.asarray(e32)
        c = e_dev - jnp.mean(e_dev, axis=0)
        m2 = jnp.dot(c.T, c, preferred_element_type=jnp.float32)
        c32 = m2 / (n - 1)
        m_dev = transform(c32)
        oracle = _host_trace_sqrt(cov64, cov_ref64)
        # (a) device transform, host f64 eigvalsh
        m_host = np.asarray(m_dev, dtype=np.float64)
        v = np.linalg.eigvalsh(m_host)
        t_a = float(np.sqrt(np.clip(v, 0.0, None)).sum())
        # (b) device transform + device f32 eigvalsh
        t_b = float(dev_trace_sqrt(m_dev))
        # (c) device transform + f32 Newton-Schulz trace
        t_c = float(dev_trace_sqrt_ns(m_dev))
        print(
            json.dumps(
                {
                    "case": name,
                    "oracle_host_f64": oracle,
                    "dev_transform_host_eigh": t_a,
                    "rel_a": abs(t_a - oracle) / abs(oracle),
                    "dev_transform_dev_eigh": t_b,
                    "rel_b": abs(t_b - oracle) / abs(oracle),
                    "dev_transform_ns_f32": t_c,
                    "rel_c": abs(t_c - oracle) / abs(oracle),
                }
            ),
            flush=True,
        )

    # --- timing ------------------------------------------------------
    _, cov64 = cases["full_rank_n2048"]
    c32 = jnp.asarray(cov64, dtype=jnp.float32)

    t_transform = _slope(transform, c32)
    print(json.dumps({"transform_s_per_call": round(t_transform, 5)}), flush=True)

    # eigvalsh output is (512,) — feed a fresh symmetric matrix each call by
    # rank-1-updating with the previous output so the loop has a data dep
    m0 = transform(c32)

    @jax.jit
    def eig_chain(m):
        v = jnp.linalg.eigvalsh(m)
        return m + 1e-12 * jnp.outer(v, v)

    t_eig_chain = _slope(eig_chain, m0)
    print(
        json.dumps({"dev_eigvalsh_s_per_call_chained": round(t_eig_chain, 5)}),
        flush=True,
    )

    # --- packed pull cost (for comparison) ----------------------------
    il = np.tril_indices(D)

    @jax.jit
    def pack(m):
        return m[il]

    packed = pack(m0)
    _ = np.asarray(packed)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(jax.device_get(pack(m0 + 0.0)))
    t_pull = (time.perf_counter() - t0) / 5
    print(json.dumps({"packed_M_pull_s": round(t_pull, 4)}), flush=True)

    # eigenvalue-only pull
    v0 = dev_eigvals(m0)
    _ = np.asarray(v0)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(jax.device_get(dev_eigvals(m0 + 0.0)))
    t_vpull = (time.perf_counter() - t0) / 5
    print(json.dumps({"eigvals_pull_s_incl_eigh": round(t_vpull, 4)}), flush=True)


if __name__ == "__main__":
    main()
