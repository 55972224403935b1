"""Streaming large-N generator eval with online covariance, sharded.

BASELINE.json config 5: a clip GENERATOR (nothing materialized — clips are
synthesized on the fly) streams through the sharded pipeline; per-batch raw
moments accumulate on device (associative Chan merge, psum-able across
chips) and only the d x d statistics ever exist in full.  With
``--metrics fad`` no raw embeddings are stored, so memory is O(d^2)
regardless of N — a 100k-clip eval fits exactly like a 100-clip one.

Run on real hardware as-is, or emulate a pod slice on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/4_streaming_eval.py --n-clips 2000 --devices 0-7

(100k clips with the dummy embedder streams in a few minutes on a laptop;
with CLAP on a v5e chip, at the measured 1450 clips/s it is ~70 s per set.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Some environments preimport jax with a preselected platform; make the
# JAX_PLATFORMS env var authoritative even then.
import os

# Demo convenience: run with random weights when no checkpoint is
# provisioned (values are then NOT metric-valid; see models/base.py).
os.environ.setdefault("AM_TPU_ALLOW_RANDOM_WEIGHTS", "1")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import argparse
import time

import numpy as np

from audio_metrics_tpu import AudioMetrics


def clip_stream(n_clips: int, sr: int, seed: int, loud: float):
    """Generator of synthetic 5 s clips — the framework never sees more than
    one batch of them at a time."""
    rng = np.random.default_rng(seed)
    t = np.arange(5 * sr) / sr
    for _ in range(n_clips):
        f0 = rng.uniform(80, 800)
        yield (
            0.2 * np.sin(2 * np.pi * f0 * t)
            + loud * rng.normal(size=t.shape)
        ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=100_000)
    ap.add_argument("--input-sr", type=int, default=16000)
    ap.add_argument("--embedder", default="dummy")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument(
        "--metrics",
        default="fad",
        help="comma list; fad-only keeps memory O(d^2) (kd/prdc need stored "
        "embeddings)",
    )
    ap.add_argument(
        "--devices",
        default=None,
        help="e.g. '0-7' or '0,1': shard the batch axis over these devices",
    )
    args = ap.parse_args()

    device_indices = None
    if args.devices:
        if "-" in args.devices:
            lo, hi = args.devices.split("-")
            device_indices = list(range(int(lo), int(hi) + 1))
        else:
            device_indices = [int(d) for d in args.devices.split(",")]

    am = AudioMetrics(
        metrics=args.metrics.split(","),
        embedder=args.embedder,
        win_dur=5.0,
        input_sr=args.input_sr,
        batch_size=args.batch_size,
        device_indices=device_indices,
    )
    sr = args.input_sr

    t0 = time.perf_counter()
    am.add_reference(clip_stream(args.n_clips, sr, seed=0, loud=0.05))
    t_ref = time.perf_counter() - t0
    n_ref = am.stem_reference.n
    print(
        f"reference: {args.n_clips} clips ({n_ref} windows) streamed in "
        f"{t_ref:.1f}s = {args.n_clips / t_ref:.0f} clips/s"
    )

    t0 = time.perf_counter()
    result = am.evaluate(clip_stream(args.n_clips, sr, seed=1, loud=0.05))
    t_eval = time.perf_counter() - t0
    print(
        f"candidate: streamed+scored in {t_eval:.1f}s = "
        f"{args.n_clips / t_eval:.0f} clips/s -> {result}"
    )


if __name__ == "__main__":
    main()
