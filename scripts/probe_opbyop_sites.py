"""Attribute every traced program in the bench warmup to its call site.

Follow-up to scripts/probe_warmup_census.py.  RESULT (2026-08-19, see
BASELINE.md "Census follow-up"): the census's 2557 "Finished tracing"
events are NOT separate executables — this CPU run (tracing synchronous
in the calling thread) shows 1108 trace events but only 14 top-level
compiles; the per-site mass (htsat.py LayerNorm/linear/softmax lines)
is inner jit-wrapped jnp ops being traced and INLINED while the outer
fused loop traces.  The TPU census stderr likewise records only 16
distinct top-level executables.  The warmup wall is the first-call
relay setup of a few big programs (30-93 s each, relay-weather), so
merging op-by-op sites has nothing to win.  Kept as the decision record
and as tooling for attributing any future trace-count growth.

Run:  python scripts/probe_opbyop_sites.py  [n_clips] [batch]
"""

import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401
from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.models.clap import LaionCLAP

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SITES = collections.Counter()
SITE_OPS = collections.defaultdict(collections.Counter)


class _SiteFilter(logging.Filter):
    def filter(self, record):
        msg = record.getMessage()
        if "Finished tracing + transforming" not in msg:
            return False
        name = msg.split("Finished tracing + transforming")[1].split(" in ")[0].strip()
        # innermost repo frame that is not this probe
        site = "<outside repo>"
        for fr in reversed(traceback.extract_stack()):
            if fr.filename.startswith(REPO) and "probe_opbyop" not in fr.filename and "/logging/" not in fr.filename:
                site = f"{os.path.relpath(fr.filename, REPO)}:{fr.lineno}"
                break
        SITES[site] += 1
        SITE_OPS[site][name.split(" for ")[0]] += 1
        return False


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.dispatch").addFilter(_SiteFilter())
    logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)

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
    SITES.clear()
    SITE_OPS.clear()

    am.add_reference(reference)
    am.evaluate(candidate)
    am.evaluate(candidate)

    total = sum(SITES.values())
    print(f"\n=== {total} programs traced during add_reference + 2x evaluate ===")
    for site, cnt in SITES.most_common(40):
        ops = ", ".join(f"{o}x{c}" for o, c in SITE_OPS[site].most_common(6))
        print(f"{cnt:5d}  {site}   [{ops}]")


if __name__ == "__main__":
    main()
