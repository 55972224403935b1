"""MUSDB18 stems example: FAD/KD/PRDC with VGGish over real music stems.

Counterpart of reference examples/2_musdb.py.  Requires the optional
``musdb`` package and dataset; everything framework-side (windowing,
resampling to the embedder rate, batching, metrics) runs on TPU.
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

import numpy as np

from audio_metrics_tpu import AudioMetrics


def musdb_tracks(subset, target="vocals", max_tracks=None):
    try:
        import musdb
    except ImportError as exc:
        raise SystemExit(
            "this example needs the optional `musdb` package and the MUSDB18 "
            "dataset (https://sigsep.github.io/datasets/musdb.html)"
        ) from exc
    db = musdb.DB(download=True, subsets=subset)
    tracks = db.tracks[:max_tracks] if max_tracks else db.tracks
    for track in tracks:
        stem = track.targets[target].audio.mean(axis=1).astype(np.float32)
        yield stem


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", default="vocals")
    parser.add_argument("--max-tracks", type=int, default=20)
    parser.add_argument("--embedder", default="vggish")
    args = parser.parse_args()

    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=args.embedder,
        win_dur=5.0,
        input_sr=44100,
    )
    am.add_reference(musdb_tracks("train", args.target, args.max_tracks))
    result = am.evaluate(musdb_tracks("test", args.target, args.max_tracks))
    for k, v in result.items():
        print(f"{k}: {v:.5f}")


if __name__ == "__main__":
    main()
