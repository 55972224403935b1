"""Time the FAD device-tail variants on the real chip.

The eigdev tail runs ``M = L^T C L`` (two 512^3 f32 gemms) plus
``eigvalsh(M)`` on the serialized relay stream, INSIDE the timed evaluate
(nothing overlaps it).  This probe slope-times, per call:

  transform   - the two gemms only (pull packed M)
  eigdev      - transform + device eigvalsh (pull 512 eigenvalues)
  nsdev       - transform + Newton-Schulz trace-sqrt (matmuls only, pull 2
                scalars) — candidate replacement if eigvalsh dominates

plus the accuracy of nsdev's Tr sqrt(M) against the f64 host eigh value.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fad_tail_ns.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401

D = 512
HI = jax.lax.Precision.HIGHEST


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((4 * D, D)).astype(np.float64)
    b = rng.standard_normal((4 * D, D)).astype(np.float64)
    cx = (a.T @ a) / (4 * D)
    cy = (b.T @ b) / (4 * D)
    l = np.linalg.cholesky(cy)
    return (
        jnp.asarray(cx, jnp.float32),
        jnp.asarray(l, jnp.float32),
        cx,
        cy,
    )


def transform(c, l):
    m = jnp.dot(l.T, jnp.dot(c, l, precision=HI), precision=HI)
    return 0.5 * (m + m.T)


@jax.jit
def f_transform(c, l):
    m = transform(c, l)
    return m[np.tril_indices(D)]


@jax.jit
def f_eigdev(c, l):
    return jnp.linalg.eigvalsh(transform(c, l))


def ns_trace_sqrt(m, n_iter):
    eye = jnp.eye(D, dtype=m.dtype)
    norm = jnp.sqrt(jnp.sum(m * m)) + 1e-30
    a = m / norm

    def body(carry, _):
        y, z = carry
        t = 0.5 * (3.0 * eye - jnp.dot(z, y, precision=HI))
        return (
            jnp.dot(y, t, precision=HI),
            jnp.dot(t, z, precision=HI),
        ), None

    (y, _), _ = jax.lax.scan(body, (a, eye), None, length=n_iter)
    return jnp.sqrt(norm) * jnp.trace(y)


def f_nsdev(n_iter):
    @jax.jit
    def run(c, l):
        return ns_trace_sqrt(transform(c, l), n_iter)

    return run


def slope(fn, args, iters=30, rounds=3):
    # warmup sync via scalar pull: block_until_ready does NOT reliably
    # block through the relay (CLAUDE.md) — the first probe version used it
    # and every variant's timed loop absorbed its own leftover compile
    # (anti-monotone nonsense numbers).
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    c, l, cx, cy = make_inputs()
    m_host = l.T.astype(np.float64) @ cx @ l.astype(np.float64)
    golden = float(np.sqrt(np.clip(np.linalg.eigvalsh(m_host), 0, None)).sum())

    t_tr = slope(f_transform, (c, l))
    print(f"transform only        : {1e3 * t_tr:7.2f} ms", flush=True)
    t_eig = slope(f_eigdev, (c, l))
    vals = np.asarray(f_eigdev(c, l), np.float64)
    eig_val = float(np.sqrt(np.clip(vals, 0, None)).sum())
    print(
        f"transform + eigvalsh  : {1e3 * t_eig:7.2f} ms   "
        f"trsqrt rel err {abs(eig_val - golden) / golden:.2e}",
        flush=True,
    )
    for n_iter in (20, 30, 40):
        fn = f_nsdev(n_iter)
        t_ns = slope(fn, (c, l))
        ns_val = float(fn(c, l))
        print(
            f"transform + NS({n_iter:2d})    : {1e3 * t_ns:7.2f} ms   "
            f"trsqrt rel err {abs(ns_val - golden) / golden:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
