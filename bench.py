"""E2E benchmark: 5 s clips -> CLAP(HTSAT-base) embeddings -> FAD+KD+PRDC.

Runs the real public-API path (AudioMetrics.add_reference / evaluate) on
synthetic 48 kHz audio with the flagship embedder (bf16 matmuls, random
weights — checkpoint-identical FLOPs).  Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "clips/s/chip", "vs_baseline": r}

vs_baseline is measured against the BASELINE.json north-star target of
5,000 5s-clips/sec/chip embed->metric E2E.
"""

import json
import os
import sys
import time

import numpy as np

# benchmark configuration: native host batcher + int16 transfer encoding
# (the framework's production configuration; both are opt-in env toggles)
os.environ.setdefault("AM_TPU_NATIVE_LOADER", "1")
os.environ.setdefault("AM_TPU_TRANSFER_INT16", "1")

N_CLIPS = int(os.environ.get("BENCH_CLIPS", "512"))
BATCH_SIZE = int(os.environ.get("BENCH_BATCH", "32"))
SR = 48000
CLIP_SECONDS = 5.0
NORTH_STAR = 5000.0


def main():
    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.models.clap import LaionCLAP

    rng = np.random.default_rng(0)
    n = int(SR * CLIP_SECONDS)
    reference = (0.2 * rng.normal(size=(N_CLIPS, n))).astype(np.float32)
    candidate = (0.2 * rng.normal(size=(N_CLIPS, n))).astype(np.float32)

    embedder = LaionCLAP(compute_dtype="bfloat16")
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=embedder,
        mix_function="L0",
        win_dur=CLIP_SECONDS,
        input_sr=SR,
        batch_size=BATCH_SIZE,
    )

    # warmup: compile the embed/moment programs
    warm = reference[: BATCH_SIZE + 1]
    t0 = time.perf_counter()
    am.add_reference(warm)
    warmup_s = time.perf_counter() - t0
    am.reset_reference()

    t0 = time.perf_counter()
    am.add_reference(reference)
    t_ref = time.perf_counter() - t0

    t0 = time.perf_counter()
    result = am.evaluate(candidate)
    t_eval = time.perf_counter() - t0

    clips_per_sec = N_CLIPS / t_eval
    out = {
        "metric": "5s-clips/sec/chip embed->metric E2E (CLAP HTSAT-base bf16, FAD+KD+PRDC)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / NORTH_STAR, 4),
    }
    print(json.dumps(out))
    print(
        json.dumps(
            {
                "detail": {
                    "n_clips": N_CLIPS,
                    "batch_size": BATCH_SIZE,
                    "warmup_s": round(warmup_s, 2),
                    "add_reference_s": round(t_ref, 2),
                    "evaluate_s": round(t_eval, 2),
                    "add_reference_clips_per_s": round(N_CLIPS / t_ref, 2),
                    "metrics": {k: float(v) for k, v in result.items()},
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
