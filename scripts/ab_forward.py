"""A/B the HTSAT forward cost under the current kernel-dispatch env config.

Measures the jitted ``htsat_encode`` (B clips, bf16 compute) as an N-call
loop with one trailing sync, which amortizes the dev relay's per-dispatch
overhead (see CLAUDE.md).  Kernel selection is taken from the environment at
import (AM_TPU_V4_STAGES / AM_TPU_ATTN_V1 / AM_TPU_NO_PALLAS), so run one
process per variant:

    AM_TPU_V4_STAGES=2u python scripts/ab_forward.py [batch] [iters]
"""

import os
import sys
import time

import numpy as np

# Make `python scripts/ab_forward.py` work without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend — see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile-cache setup)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, htsat_encode, init_params


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = HTSAT_BASE
    params = {k: jnp.asarray(v) for k, v in init_params(cfg).items()}
    rng = np.random.default_rng(0)
    # 1001 frames = the 10 s CLAP mel length (48 kHz, hop 480)
    mel = jnp.asarray(rng.normal(size=(b, 1001, 64)).astype(np.float32) - 4.0)

    fwd = jax.jit(
        lambda p, m: htsat_encode(p, m, cfg, compute_dtype=jnp.bfloat16)
    )
    t0 = time.perf_counter()
    out = fwd(params, mel)
    _ = float(jnp.sum(out))  # sync through the relay
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, mel)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n

    print(
        f"V4_STAGES={os.environ.get('AM_TPU_V4_STAGES', '<default>')!r} "
        f"ATTN_V1={os.environ.get('AM_TPU_ATTN_V1', '')!r} "
        f"B={b}: encode {1e3 * dt:7.2f} ms  ({b / dt:6.0f} clips/s)  "
        f"[first-call {warm:.1f} s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
