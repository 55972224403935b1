"""Real-weights end-to-end eval: the metric-validity proof run.

Counterpart of the reference's default usage (embedders/clap.py:17-18
downloads the LAION music checkpoint and evaluates with real weights).
This environment has no egress, so the run activates when the checkpoint
is provisioned:

    AM_TPU_CKPT_DIR=/path/with/music_audioset_epoch_15_esc_90.14.pt \
        python examples/5_real_weights_eval.py

It then evaluates reference-style synthetic real/fake pairs (matching vs
mismatched context+stem, utils/example_utils.py) with REAL CLAP weights and
prints the FAD/KD/PRDC/APA values — numbers suitable for recording in
BASELINE.md as the framework's first metric-valid output.  Without a
checkpoint it exits with instructions instead of silently running random
weights.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def main(n_items: int = 24) -> int:
    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.models.clap import LAION_CLAP_MUSIC_CHECKPOINT_URL
    from audio_metrics_tpu.utils.example_utils import mix_stem_pair
    from audio_metrics_tpu.utils.get_url import resolve_checkpoint

    ckpt = resolve_checkpoint(LAION_CLAP_MUSIC_CHECKPOINT_URL)
    if ckpt is None:
        print(
            "No real CLAP checkpoint reachable.  Provision\n"
            f"  {LAION_CLAP_MUSIC_CHECKPOINT_URL.rsplit('/', 1)[-1]}\n"
            "under $AM_TPU_CKPT_DIR (or the cache dir) and re-run."
        )
        return 1

    sr = 48000
    rng = np.random.default_rng(0)

    def pairs(matching):
        out = []
        for _ in range(n_items):
            ctx, stem, _ = mix_stem_pair(sr, 5.0, matching, rng)
            out.append(np.stack([ctx, stem], axis=1).astype(np.float32))
        return out

    real = pairs(True)
    fake = pairs(False)

    am = AudioMetrics(
        metrics=["apa", "fad", "kd", "prdc"],
        embedder="laion_clap_music",  # real weights: resolve_checkpoint found them
        win_dur=5.0,
        input_sr=sr,
    )
    am.add_reference(real)
    res_real = am.evaluate(real)
    res_fake = am.evaluate(fake)
    print("real vs real:", {k: round(float(v), 6) for k, v in res_real.items()})
    print("fake vs real:", {k: round(float(v), 6) for k, v in res_fake.items()})
    assert res_fake["fad"] > res_real["fad"], "fake should score worse"
    print("metric-validity check passed (fake scores worse than real)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
