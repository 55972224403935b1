"""A/B the full CLAP forward (audio -> embedding) with/without the fused
audio->tokens frontend kernel (ops/frontend_fused.py).

The fused/unfused switch (AM_TPU_NO_FUSED_FRONTEND) is read at import, so
run one process per variant:

    python scripts/ab_fused_frontend.py [batch] [iters]           # fused
    AM_TPU_NO_FUSED_FRONTEND=1 python scripts/ab_fused_frontend.py ...

Audio is GENERATED ON DEVICE (same seed both variants) so no host->device
transfer rides the timed loop or the relay's 100 MB wedge limit; the loop
uses the N-call + trailing-scalar-sync slope method (CLAUDE.md).  Prints
the per-call forward time and an output checksum for cross-process parity.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile-cache setup)
from audio_metrics_tpu.models.clap import (
    SAMPLE_RATE,
    _clap_forward,
    init_projection_params,
)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, init_params


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = HTSAT_BASE
    params = init_params(cfg, seed=0)
    params.update(init_projection_params(cfg, seed=0))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    n = 5 * SAMPLE_RATE
    audio = jax.jit(
        lambda: 0.2
        * jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)
    )()
    jax.block_until_ready(audio)

    fwd = jax.jit(
        lambda p, a: _clap_forward(p, a, cfg, jnp.bfloat16)["embedding"]
    )
    t0 = time.perf_counter()
    out = fwd(params, audio)
    _ = float(jnp.sum(out))
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, audio)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters

    chk = float(jnp.mean(jnp.abs(out)))
    mode = "unfused" if os.environ.get("AM_TPU_NO_FUSED_FRONTEND") else "fused"
    print(
        f"frontend={mode} B={b}: forward {1e3 * dt:7.2f} ms "
        f"({b / dt:6.0f} clips/s)  checksum {chk:.6f}  "
        f"[first-call {warm:.1f} s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
