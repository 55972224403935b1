"""Marginal evaluate cost of the fad_inf subset sweep (one process).

Consecutive-evaluate minima with metrics ["fad","kd","prdc"] vs
["fad","kd","prdc","fad_inf"] on the same device-resident tensors.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fad_inf.py
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


def main():
    n = int(SR * 5.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = jax.jit(lambda k: 0.2 * jax.random.normal(k, (N_CLIPS, n), jnp.float32))
    reference, candidate = gen(k1), gen(k2)
    jax.block_until_ready((reference, candidate))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    best = {}
    vals = {}
    for metrics in (
        ["fad", "kd", "prdc"],
        ["fad", "kd", "prdc", "fad_inf"],
    ):
        am = AudioMetrics(
            metrics=metrics,
            embedder=emb,
            mix_function="L0",
            win_dur=5.0,
            input_sr=SR,
            batch_size=N_CLIPS,
        )
        am.add_reference(reference)
        vals["+".join(metrics)] = am.evaluate(candidate)  # warm
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            am.evaluate(candidate)
            runs.append(round(time.perf_counter() - t0, 4))
        best["+".join(metrics)] = min(runs)
        print(json.dumps({"metrics": metrics, "runs": runs}), flush=True)
    keys = list(best)
    out = vals[keys[1]]
    print(
        json.dumps(
            {
                "base_s": best[keys[0]],
                "with_fad_inf_s": best[keys[1]],
                "fad_inf_marginal_ms": round(
                    1e3 * (best[keys[1]] - best[keys[0]]), 1
                ),
                "fad": out["fad"],
                "fad_inf": out["fad_inf"],
                "fad_inf_slope": out["fad_inf_slope"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
