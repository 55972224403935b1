"""E2E A/B of the FAD evaluate-tail modes (AM_TPU_FAD_TAIL) in ONE process.

Relay weather makes cross-process comparisons meaningless (BASELINE.md);
this probe warms everything up, then runs N consecutive evaluates per mode
(host -> packed -> eigdev -> host again to bracket drift), flipping the env
var between batches.  The first evaluate of each mode compiles/registers
that mode's tail program and is reported separately.

Run: python scripts/probe_fad_e2e.py   (real TPU, warm compile cache)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.models.clap import LaionCLAP

SR = 48000
N_CLIPS = 2048
BATCH = 128
RUNS = int(os.environ.get("PROBE_RUNS", "5"))
MODES = os.environ.get("PROBE_MODES", "host,packed,eigdev,host").split(",")


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
    os.environ["AM_TPU_FAD_TAIL"] = "host"
    t0 = time.perf_counter()
    am.add_reference(reference)
    am.evaluate(candidate)
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 2)}), flush=True)
    am.reset_reference()
    am.add_reference(reference)

    fads = {}
    for mode in MODES:
        os.environ["AM_TPU_FAD_TAIL"] = mode
        runs = []
        for i in range(RUNS):
            t0 = time.perf_counter()
            result = am.evaluate(candidate)
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            if i == 0:
                fads[mode] = result["fad"]
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "run": i + 1,
                        "evaluate_s": round(dt, 3),
                        "timings": {
                            k: round(v, 3) for k, v in am.timings.items()
                        },
                    }
                ),
                flush=True,
            )
        tail = runs[1:] or runs
        print(
            json.dumps(
                {
                    "mode": mode,
                    "runs": runs,
                    "best_post_first": min(tail),
                    "clips_per_s": round(N_CLIPS / min(tail), 1),
                }
            ),
            flush=True,
        )
    base = fads.get("host")
    if base is not None:
        print(
            json.dumps(
                {
                    "fad_values": fads,
                    "rel_vs_host": {
                        m: abs(v - base) / max(abs(base), 1e-30)
                        for m, v in fads.items()
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
