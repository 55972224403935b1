"""Census of the jitted programs a cold-process bench warmup touches.

The round-3 warmup attribution (BASELINE.md) showed the 46-652 s warm-cache
warmup is per-program first-call relay setup (executable registration on the
remote backend), not compile/trace.  The only in-library lever left is the
NUMBER of distinct programs the warmup path executes.  This probe runs the
bench-identical warmup (add_reference + evaluate at bench shapes, warm
persistent cache) with ``jax_log_compiles`` on and a relative-timestamp log
formatter: every "Finished tracing + transforming <name>" line marks a NEW
program entering the process, and the wall-clock gap to the next line is
dominated by that program's first-call relay setup (compile ~0 on a warm
cache).  Output: a timeline + a per-program table to aim merges at.

Run (TPU):  python scripts/probe_warmup_census.py  [n_clips] [batch]

RESULT (2026-08-19): 2557 trace events but only 16 top-level executables
(almost all events are inner jits inlined into the fused-loop trace —
verified by scripts/probe_opbyop_sites.py on CPU); the timeline has two
holes, 220 s after `_pack` (first blocking execution of the fused loop)
and 4 s after `_knn_call`.  Conclusion in BASELINE.md "Census follow-up":
the warmup wall is per-BIG-program relay first-call setup, not program
count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import logging

import numpy as np

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile-cache setup)
from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.models.clap import LaionCLAP

T0 = time.perf_counter()
EVENTS = []  # (t_rel, kind, name)


class _RelFormatter(logging.Formatter):
    def format(self, record):
        t = time.perf_counter() - T0
        msg = record.getMessage()
        if "Finished tracing + transforming" in msg:
            name = msg.split("Finished tracing + transforming")[1].split(
                " in "
            )[0].strip()
            EVENTS.append((t, "trace", name))
        elif "Compiling" in msg:
            EVENTS.append((t, "compile", msg.split("Compiling", 1)[1][:60]))
        return f"[{t:8.2f}s] {msg[:140]}"


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    jax.config.update("jax_log_compiles", True)
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(_RelFormatter())
    for name in ("jax._src.interpreters.pxla", "jax._src.pjit", "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(h)
        lg.setLevel(logging.DEBUG)

    sr, n = 48000, int(48000 * 5.0)
    emb = LaionCLAP(ckpt=None, compute_dtype="bfloat16", allow_random_weights=True)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=emb,
        mix_function="L0",
        win_dur=5.0,
        input_sr=sr,
        batch_size=batch,
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    reference = 0.2 * jax.random.normal(k1, (n_clips, n), jnp.float32)
    candidate = 0.2 * jax.random.normal(k2, (n_clips, n), jnp.float32)
    jax.block_until_ready((reference, candidate))

    marks = []

    def mark(label):
        t = time.perf_counter() - T0
        marks.append((t, label))
        print(f"===MARK[{t:8.2f}s] {label}", file=sys.stderr, flush=True)

    mark("add_reference:start")
    am.add_reference(reference)
    mark("add_reference:end")
    am.evaluate(candidate)
    mark("evaluate:end")
    am.evaluate(candidate)
    mark("evaluate2:end")

    # per-program attribution: gap from each trace event to the next
    # trace/mark event (first-call setup + any host work in between)
    bounds = sorted(EVENTS + [(t, "mark", l) for t, l in marks])
    traces = [(t, name) for t, kind, name in bounds if kind == "trace"]
    print("\n=== program census (trace order) ===")
    total = 0.0
    for i, (t, name) in enumerate(traces):
        nxt = next((tb for tb, k, _ in bounds if tb > t), None)
        gap = (nxt - t) if nxt is not None else 0.0
        total += gap
        print(f"{t:8.2f}s  +{gap:7.2f}s  {name}")
    print(f"programs={len(traces)} attributed_gap_total={total:.1f}s "
          f"wall={time.perf_counter() - T0:.1f}s")


if __name__ == "__main__":
    main()
