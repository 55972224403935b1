"""Same-process A/B: fused Pallas merge at ALL stages vs stages 0,1 only
(merge 2 on the XLA conv form).

The round-5 B=128 phase ledger measured merge 2 (16x16, C=512->1024) at
1.57 ms/128 standalone — 7x the conv form's historical 0.22 — while
merges 0/1 improved.  Standalone phases overstate in-context cost
(BASELINE.md in-context fusion lesson), so this decides the per-stage
table (AM_TPU_FUSED_MERGE_STAGES) on the full forward.

    python scripts/ab_merge2.py [batch] [iters] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401
from audio_metrics_tpu.models.clap import (
    SAMPLE_RATE,
    _clap_forward,
    init_projection_params,
)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, init_params


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = HTSAT_BASE
    params = init_params(cfg, seed=0)
    params.update(init_projection_params(cfg, seed=0))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    n = 5 * SAMPLE_RATE
    audio = jax.jit(
        lambda: 0.2
        * jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)
    )()
    _ = float(jnp.sum(audio[:1]))

    def make_fwd(stages):
        if stages is None:
            os.environ.pop("AM_TPU_FUSED_MERGE_STAGES", None)
        else:
            os.environ["AM_TPU_FUSED_MERGE_STAGES"] = stages
        _clap_forward.clear_cache()
        fn = jax.jit(
            lambda p, a: _clap_forward(p, a, cfg, jnp.bfloat16)["embedding"]
        )
        out = fn(params, audio)
        _ = float(jnp.sum(out))
        return fn, out

    variants = {"all": None, "01": "0,1"}
    fwds = {}
    for name, stages in variants.items():
        t0 = time.perf_counter()
        fwds[name], out = fwds.get(name), None
        fwds[name], out = make_fwd(stages), None
        fn, o = fwds[name]
        print(f"first-call {name}: {time.perf_counter() - t0:.1f} s", flush=True)
    rel = float(
        jnp.max(jnp.abs(fwds["all"][1] - fwds["01"][1]))
        / (jnp.max(jnp.abs(fwds["01"][1])) + 1e-12)
    )
    print(f"max-rel-diff {rel:.2e}", flush=True)

    best = {k: float("inf") for k in variants}
    for r in range(rounds):
        for name in variants:
            fn, _o = fwds[name]
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, audio)
            _ = float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(
                f"round {r} merge-stages={name:3s} B={b}: {1e3 * dt:7.2f} ms "
                f"({b / dt:6.0f} clips/s)",
                flush=True,
            )
    print(
        f"BEST all {1e3 * best['all']:.2f} vs 01 {1e3 * best['01']:.2f} ms "
        f"(delta {1e3 * (best['all'] - best['01']):+.2f} ms/{b}; negative "
        f"= fused merge 2 wins, positive = conv merge 2 wins)",
        flush=True,
    )
    os.environ.pop("AM_TPU_FUSED_MERGE_STAGES", None)


if __name__ == "__main__":
    main()
