"""Marginal evaluate-cost of each metric's device tail, one process.

Runs the full CLAP evaluate (2048 clips, device-resident) with metric sets
["fad"], ["fad","kd"], ["fad","kd","prdc"] against the SAME reference /
candidate tensors; consecutive-evaluate minima difference out each
metric's marginal cost on the serialized relay stream (weather hits all
three alike).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tail_marginals.py
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


def main():
    n = int(SR * 5.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    reference = 0.2 * jax.random.normal(k1, (N_CLIPS, n), jnp.float32)
    candidate = 0.2 * jax.random.normal(k2, (N_CLIPS, n), jnp.float32)
    jax.block_until_ready((reference, candidate))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    results = {}
    for metrics in (["fad"], ["fad", "kd"], ["fad", "kd", "prdc"]):
        am = AudioMetrics(
            metrics=metrics,
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
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            am.evaluate(candidate)
            runs.append(round(time.perf_counter() - t0, 4))
        key = "+".join(metrics)
        results[key] = min(runs)
        print(
            json.dumps({"metrics": key, "warm_s": round(warm, 1), "runs": runs}),
            flush=True,
        )
    keys = list(results)
    print(
        json.dumps(
            {
                "base_fad_s": results[keys[0]],
                "kd_marginal_ms": round(1e3 * (results[keys[1]] - results[keys[0]]), 1),
                "prdc_marginal_ms": round(
                    1e3 * (results[keys[2]] - results[keys[1]]), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
