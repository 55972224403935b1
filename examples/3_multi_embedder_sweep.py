"""Multi-embedder sweep: FAD/KD/PRDC over every registry embedder.

BASELINE.json config 4 ("VGGish + CLAP 3-layer FAD/KD/PRDC sweep"): the same
reference/candidate sets scored by all seven registry embedders — the two
CLAP checkpoints x three tap layers (512/512/512-d) and VGGish (128-d).
Each embedder gets its own AudioMetrics instance (embedding spaces are not
comparable across embedders; the reference does the same, one instance per
`embedder=` name).

With no cached checkpoints the CLAP/VGGish weights are seeded-random
(structure-valid, not metric-valid) — the sweep still demonstrates the
registry surface and relative scoring.  Usage:

    python examples/3_multi_embedder_sweep.py [--n-clips 64] [--embedders a,b]
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
from audio_metrics_tpu.models import EMBEDDERS


def synth_sets(n_clips: int, sr: int, seed: int = 0):
    """Reference = tonal clips; candidate A = same family, candidate B =
    noisier family (should score worse on every embedder)."""
    rng = np.random.default_rng(seed)
    t = np.arange(5 * sr) / sr

    def tonal(f0, noise):
        x = 0.0
        for k in (1, 2, 3):
            x = x + np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
        return (0.2 * x + noise * rng.normal(size=t.shape)).astype(np.float32)

    ref = np.stack([tonal(rng.uniform(100, 400), 0.02) for _ in range(n_clips)])
    near = np.stack([tonal(rng.uniform(100, 400), 0.02) for _ in range(n_clips)])
    far = np.stack([tonal(rng.uniform(600, 2000), 0.3) for _ in range(n_clips)])
    return ref, near, far


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=64)
    ap.add_argument("--input-sr", type=int, default=48000)
    ap.add_argument(
        "--embedders",
        default=",".join(EMBEDDERS),
        help="comma-separated registry names (default: all)",
    )
    args = ap.parse_args()

    ref, near, far = synth_sets(args.n_clips, args.input_sr)
    names = [n for n in args.embedders.split(",") if n]
    print(f"{args.n_clips} clips x {len(names)} embedders")
    for name in names:
        t0 = time.perf_counter()
        am = AudioMetrics(
            metrics=["fad", "kd", "prdc"],
            embedder=name,
            win_dur=5.0,
            input_sr=args.input_sr,
        )
        am.add_reference(ref)
        r_near = am.evaluate(near)
        r_far = am.evaluate(far)
        dt = time.perf_counter() - t0
        print(
            f"{name:28s} fad {r_near['fad']:>12.4g} / {r_far['fad']:>12.4g}"
            f"   density {r_near['density']:.2f} / {r_far['density']:.2f}"
            f"   ({dt:.1f}s)"
        )
        assert r_near["fad"] <= r_far["fad"], (name, r_near["fad"], r_far["fad"])
    print("sweep OK: near-candidates beat far-candidates on every embedder")


if __name__ == "__main__":
    main()
