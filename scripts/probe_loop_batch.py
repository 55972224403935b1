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
    batches = [int(a) for a in sys.argv[1:]] or [128, 256]
    loops = {bs: _get_fused_embed_loop(emb, bs) for bs in batches}
    for bs in batches:  # first calls (compile + relay setup) off the clock
        t0 = time.perf_counter()
        _ = sync(loops[bs](params, w, N_CLIPS))
        print(f"bs={bs} first call {time.perf_counter() - t0:.1f} s", flush=True)
    best = {bs: float("inf") for bs in batches}
    for _r in range(4):  # alternating rounds: same weather for every bs
        for bs in batches:
            t0 = time.perf_counter()
            _ = sync(loops[bs](params, w, N_CLIPS))
            best[bs] = min(best[bs], time.perf_counter() - t0)
    for bs in batches:
        b = best[bs]
        print(
            f"loop bs={bs}: {1e3 * b:7.1f} ms for {N_CLIPS} clips "
            f"({N_CLIPS / b:6.0f} clips/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
