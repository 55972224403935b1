"""Itemize the fixed per-evaluate mass over the bare fused-loop program.

Round-4 marginals (probe_tail_marginals.py) put the fad-only evaluate at
~21 ms over the pure forward cost (16 x 33.05 ms at loop batch 128); this
probe separates that mass into:

- t_dispatch: host time for the (cached) loop call to RETURN (async) — the
  pjit fastpath + relay send cost;
- t_loop: bare loop dispatch -> scalar drain (device_get of the n carry) —
  the pure device stream floor, including one pull RTT;
- t_rtt: device_get of an already-ready scalar — the pull round trip alone;
- t_eval: the full fad-only evaluate through the public API;
- fixed = t_eval - t_loop: AudioMetrics/pipeline host glue + the FAD tail
  dispatch + bookkeeping.

One process, alternating, min-of-N (relay weather hits all alike).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fixed_mass.py
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
from audio_metrics_tpu.parallel.pipeline import _get_fused_embed_loop, _n_valid_dev

SR = 48000
N_CLIPS = int(os.environ.get("PROBE_CLIPS", "2048"))
BATCH = int(os.environ.get("PROBE_BATCH", "512"))
RUNS = int(os.environ.get("PROBE_RUNS", "6"))


def main():
    n = int(SR * 5.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    reference = 0.2 * jax.random.normal(k1, (N_CLIPS, n), jnp.float32)
    candidate = 0.2 * jax.random.normal(k2, (N_CLIPS, n), jnp.float32)
    jax.block_until_ready((reference, candidate))

    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    am = AudioMetrics(
        metrics=["fad"],
        embedder=emb,
        mix_function="L0",
        win_dur=5.0,
        input_sr=SR,
        batch_size=BATCH,
    )
    t0 = time.perf_counter()
    am.add_reference(reference)
    am.evaluate(candidate)
    print(json.dumps({"warm_s": round(time.perf_counter() - t0, 1)}), flush=True)

    loop = _get_fused_embed_loop(emb, BATCH)
    params = emb.params
    nv = _n_valid_dev(N_CLIPS)

    t_dispatch, t_loop, t_rtt, t_eval = [], [], [], []
    for _ in range(RUNS):
        # bare loop: dispatch + drain
        t0 = time.perf_counter()
        buf, nn, s1, m2 = loop(params, candidate, nv)
        t_dispatch.append(time.perf_counter() - t0)
        float(jax.device_get(nn))
        t_loop.append(time.perf_counter() - t0)
        # pure pull RTT on the already-ready scalar
        t0 = time.perf_counter()
        float(jax.device_get(nn))
        t_rtt.append(time.perf_counter() - t0)
        # full public-API evaluate
        t0 = time.perf_counter()
        am.evaluate(candidate)
        t_eval.append(time.perf_counter() - t0)

    out = {
        "n_clips": N_CLIPS,
        "batch": BATCH,
        "t_dispatch_ms": round(1e3 * min(t_dispatch), 2),
        "t_loop_s": round(min(t_loop), 4),
        "t_rtt_ms": round(1e3 * min(t_rtt), 2),
        "t_eval_s": round(min(t_eval), 4),
        "fixed_ms": round(1e3 * (min(t_eval) - min(t_loop)), 1),
        "runs_loop": [round(t, 4) for t in t_loop],
        "runs_eval": [round(t, 4) for t in t_eval],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
