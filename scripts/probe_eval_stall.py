"""Probe the recurring second-timed-evaluate stall (~4-14 s).

Every recorded bench session shows the SAME shape: timed evaluate runs
[fast, SLOW, fast] (ROADMAP.md verification notes).  This probe runs six
consecutive evaluates after the standard warmup and brackets each with
timers, plus a gc.collect() timer between runs, to separate:

  (a) a deterministic one-time post-first-evaluate cost (cache write-back,
      lazy host allocation),
  (b) Python GC of the prior evaluate's device buffers hitting the
      serialized relay stream,
  (c) random relay jitter (would not favor run 2).

Run: python scripts/probe_eval_stall.py   (real TPU, warm compile cache)
"""

import gc
import json
import os
import sys
import time

# Make `python scripts/probe_eval_stall.py` work without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend — see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.models.clap import LaionCLAP

SR = 48000
N_CLIPS = 2048
BATCH = 128


def main():
    n = int(SR * 5.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    reference = 0.2 * jax.random.normal(k1, (N_CLIPS, n), jnp.float32)
    candidate = 0.2 * jax.random.normal(k2, (N_CLIPS, n), jnp.float32)
    jax.block_until_ready((reference, candidate))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=emb,
        mix_function="L0",
        win_dur=5.0,
        input_sr=SR,
        batch_size=BATCH,
    )
    t0 = time.perf_counter()
    am.add_reference(reference)
    am.evaluate(candidate)
    warm = time.perf_counter() - t0
    am.reset_reference()
    am.add_reference(reference)
    print(json.dumps({"warmup_s": round(warm, 2)}), flush=True)

    # A/B knob: clear the KD reference-Gram row-sum cache before every
    # evaluate to reproduce the uncached (reference-equivalent) behavior —
    # the delta vs the default run is what the cache saves per evaluate.
    kd_nocache = bool(os.environ.get("AM_TPU_PROBE_KD_NOCACHE"))
    if kd_nocache:
        from audio_metrics_tpu.metrics import kd as _kd

    runs = []
    for i in range(6):
        if kd_nocache:
            _kd._KT_YY_CACHE.clear()
            _kd._KT_YY_KEEP.clear()
        # run 5 with the pipeline-end sync re-inserted so the default
        # (eigdev) mode gets one attributed pipeline/tail split per session
        # (AM_TPU_TIMING_SYNC; read per-call in evaluate())
        if i == 4:
            os.environ["AM_TPU_TIMING_SYNC"] = "1"
        else:
            os.environ.pop("AM_TPU_TIMING_SYNC", None)
        t0 = time.perf_counter()
        am.evaluate(candidate)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_collected = gc.collect()
        gc_dt = time.perf_counter() - t0
        runs.append(
            {
                "run": i + 1,
                "evaluate_s": round(dt, 3),
                "gc_s": round(gc_dt, 3),
                "gc_collected": n_collected,
                # Per-stage clock from evaluate() — splits pipeline vs
                # finalize so a stall can be localized, not just observed.
                "timings": {k: round(v, 3) for k, v in am.timings.items()},
            }
        )
        print(json.dumps(runs[-1]), flush=True)
    print(json.dumps({"runs": [r["evaluate_s"] for r in runs]}))


if __name__ == "__main__":
    main()
