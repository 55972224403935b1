"""Serving-soak: N consecutive evaluates on one AudioMetrics instance.

Production serving runs many evaluates against a fixed reference; this
probe checks (a) throughput stays flat (no per-call drift from cache
growth, re-tracing, or device-memory creep), (b) results stay bitwise
identical call to call, (c) host RSS and the jit cache stay bounded.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_soak.py [n_evals]
"""

import json
import os
import resource
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
N_EVALS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    n = int(SR * 5.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = jax.jit(lambda k: 0.2 * jax.random.normal(k, (N_CLIPS, n), jnp.float32))
    reference, candidate = gen(k1), gen(k2)
    jax.block_until_ready((reference, candidate))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=emb,
        mix_function="L0",
        win_dur=5.0,
        input_sr=SR,
        batch_size=N_CLIPS,
    )
    t0 = time.perf_counter()
    am.add_reference(reference)
    first = am.evaluate(candidate)
    print(
        json.dumps({"warm_s": round(time.perf_counter() - t0, 1),
                    "rss_mb": round(rss_mb(), 1)}),
        flush=True,
    )

    times = []
    for i in range(N_EVALS):
        t0 = time.perf_counter()
        res = am.evaluate(candidate)
        times.append(time.perf_counter() - t0)
        for k, v in first.items():
            assert res[k] == v, (i, k, res[k], v)
        if (i + 1) % 20 == 0:
            recent = times[-20:]
            print(
                json.dumps(
                    {
                        "evals": i + 1,
                        "last20_mean_s": round(sum(recent) / len(recent), 4),
                        "last20_max_s": round(max(recent), 4),
                        "rss_mb": round(rss_mb(), 1),
                    }
                ),
                flush=True,
            )

    times.sort()
    k = len(times)
    print(
        json.dumps(
            {
                "n_evals": N_EVALS,
                "min_s": round(times[0], 4),
                "p50_s": round(times[k // 2], 4),
                "p90_s": round(times[int(0.9 * k)], 4),
                "max_s": round(times[-1], 4),
                "clips_per_s_p50": round(N_CLIPS / times[k // 2], 1),
                "results_bitwise_stable": True,
                "rss_mb": round(rss_mb(), 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
