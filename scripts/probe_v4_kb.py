"""One-process sweep of the v4 whole-block kernel's VMEM budget (kb size).

Tests whether enlarging the per-grid-step batch block (kb) buys anything —
i.e. whether the constant-index weight blocks are actually re-DMA'd per
grid step (the code comment's assumption) or cached by Mosaic's pipeliner
when the index map output is unchanged.  The budget global is read at
trace time inside ``_swin_block_call_v4``, so each variant clears that
jit's cache and re-jits a fresh outer wrapper; 30-iter queued loop with
one trailing sync per variant (CLAUDE.md timing rules).

Run (TPU):  python scripts/probe_v4_kb.py [batch] [iters] [budgets_mb...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import numpy as np

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile-cache setup)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, htsat_encode, init_params
from audio_metrics_tpu.ops import attention


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    budgets = [int(a) for a in sys.argv[3:]] or [48, 80, 24]

    cfg = HTSAT_BASE
    params = {k: jnp.asarray(v) for k, v in init_params(cfg).items()}
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(b, 1001, 64)).astype(np.float32) - 4.0)
    jax.block_until_ready((mel,))

    for mb in budgets:
        attention._V4_VMEM_BUDGET = mb * 1024 * 1024
        attention._swin_block_call_v4.clear_cache()
        fwd = jax.jit(
            lambda p, m: htsat_encode(p, m, cfg, compute_dtype=jnp.bfloat16)
        )
        t0 = time.perf_counter()
        out = fwd(params, mel)
        _ = float(jnp.sum(out))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, mel)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n
        print(
            f"V4_VMEM_MB={mb:3d}  B={b}: encode {1e3 * dt:7.2f} ms "
            f"({b / dt:6.0f} clips/s)  [first-call {warm:.1f} s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
