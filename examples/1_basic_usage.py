"""Basic usage: APA + FAD over synthetic context/stem pairs.

Counterpart of reference examples/1_basic_usage.py: generate matching
("real") and mismatched ("fake") context+stem wav pairs, add the real set as
the reference, then evaluate both sets — the fake set should score worse.

Run with a real checkpoint cached (see audio_metrics_tpu.models.clap) for
meaningful values; falls back to random CLAP weights otherwise.
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


import tempfile
from pathlib import Path

import numpy as np

from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.utils.example_utils import generate_audio_samples
from audio_metrics_tpu.utils.wavio import read_wav


def wav_dir_iterator(path):
    for fp in sorted(Path(path).glob("*.wav")):
        data, _sr = read_wav(fp)
        yield data  # (n_samples, 2): context + stem


def main(n_items=20, embedder="laion_clap_music"):
    sr = 48000
    with tempfile.TemporaryDirectory() as tmp:
        audio_dir = Path(tmp) / "audio"
        print(f"generating {n_items} real/fake samples in {audio_dir}")
        generate_audio_samples(audio_dir, n_items=n_items, sr=sr)

        metrics = AudioMetrics(
            metrics=["apa", "fad"],
            embedder=embedder,
            win_dur=5.0,
            input_sr=sr,
        )
        metrics.add_reference(wav_dir_iterator(audio_dir / "real"))

        result_real = metrics.evaluate(wav_dir_iterator(audio_dir / "real"))
        result_fake = metrics.evaluate(wav_dir_iterator(audio_dir / "fake"))
        print("real:", result_real)
        print("fake:", result_fake)


if __name__ == "__main__":
    main()
