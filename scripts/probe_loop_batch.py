"""Attribute the evaluate's fixed mass and test bigger loop batches.

evaluate(fad-only) measures 0.5503 s for 2048 clips while 16 x the
standalone B=128 forward is 0.529 — ~21 ms of fixed mass.  This probe
times the fused embed loop program DIRECTLY (one dispatch, scalar sync)
for batch_size 128 and 256 on the same device-resident 2048-clip window
set, so the loop's own cost separates from the AudioMetrics host glue,
and a B=256 win/loss is decided in the same session.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_loop_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

from audio_metrics_tpu.models.clap import SAMPLE_RATE, LaionCLAP
from audio_metrics_tpu.parallel.pipeline import _get_fused_embed_loop

N_CLIPS = 2048


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[1]))


def main():
    n = 5 * SAMPLE_RATE
    w = jax.jit(
        lambda: 0.2
        * jax.random.normal(jax.random.PRNGKey(0), (N_CLIPS, n), jnp.float32)
    )()
    _ = float(jnp.sum(w[:1]))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    params = emb.params
    for bs in (128, 256):
        loop = _get_fused_embed_loop(emb, bs)
        t0 = time.perf_counter()
        out = loop(params, w, N_CLIPS)
        _ = sync(out)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            out = loop(params, w, N_CLIPS)
            _ = sync(out)
            best = min(best, time.perf_counter() - t0)
        print(
            f"loop bs={bs}: {1e3 * best:7.1f} ms for {N_CLIPS} clips "
            f"({N_CLIPS / best:6.0f} clips/s)  [first {warm:.1f} s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
