"""Marginal cost of the CLAP mel frontend, batch-slope method.

The round-2 ledger (BASELINE.md) recorded mel at 0.92 ms/64 clips with the
tiled repeat-pad path, but the post-0.5.0 ledger read 1.7 ms/64 — this probe
re-measures mel alone, at both B=64 and B=128 grouping, to decide whether the
tiled path regressed or the ledger row was noise.

Inputs are generated ON DEVICE (jax.random) so the dev relay's ~27 MB/s
host->device link never appears in the measurement.

Usage: python scripts/probe_mel.py [B] [iters]
"""

import os
import sys
import time

# Run directly via `python scripts/...` without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend - see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile cache setup)
from audio_metrics_tpu.models.clap import clap_mel_tiled

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CLIP = 240_000


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def timed(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS


def slope(fn, lo, hi):
    lows, highs = [], []
    for _ in range(3):
        lows.append(timed(fn, lo))
        highs.append(timed(fn, hi))
    return (min(highs) - min(lows)) / 2.0


def main():
    key = jax.random.PRNGKey(0)
    audio = {
        b: 0.2 * jax.random.normal(key, (b, CLIP), jnp.float32)
        for b in (B, 3 * B)
    }
    for a in audio.values():
        sync(a)

    mel = jax.jit(lambda a: clap_mel_tiled(a, compute_dtype=jnp.bfloat16))
    t = slope(mel, audio[B], audio[3 * B])
    print(f"mel (tiled)  B={B}: {1e3 * t:8.3f} ms / {B} clips", flush=True)
    # absolute single-batch numbers for context (carry ~6 ms relay overhead)
    for b in (B, 3 * B):
        print(f"  abs B={b}: {1e3 * timed(mel, audio[b]):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
