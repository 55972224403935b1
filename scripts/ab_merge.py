"""Same-process A/B of the fused Pallas patch-merge (ops/merge.py).

Alternating rounds of the full CLAP forward with AM_TPU_NO_FUSED_MERGE
flipped between jits (htsat reads it at trace time); _clap_forward's inner
jit cache is cleared per variant (see scripts/ab_fused_frontend.py for the
gotcha).  Relay weather hits both variants alike -> decision-grade delta.

    python scripts/ab_merge.py [batch] [iters] [rounds]
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

    def make_fwd(no_fused_merge):
        if no_fused_merge:
            os.environ["AM_TPU_NO_FUSED_MERGE"] = "1"
        else:
            os.environ.pop("AM_TPU_NO_FUSED_MERGE", None)
        _clap_forward.clear_cache()
        fn = jax.jit(
            lambda p, a: _clap_forward(p, a, cfg, jnp.bfloat16)["embedding"]
        )
        out = fn(params, audio)
        _ = float(jnp.sum(out))
        return fn, out

    t0 = time.perf_counter()
    fwd_fused, out_fused = make_fwd(False)
    warm_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    fwd_xla, out_xla = make_fwd(True)
    warm_x = time.perf_counter() - t0

    rel = float(
        jnp.max(jnp.abs(out_fused - out_xla))
        / (jnp.max(jnp.abs(out_xla)) + 1e-12)
    )
    print(
        f"max-rel-diff {rel:.2e}  [first-call fused {warm_f:.1f} s, "
        f"xla {warm_x:.1f} s]",
        flush=True,
    )

    best = {"fused": float("inf"), "xla": float("inf")}
    for r in range(rounds):
        for name, fn in (("fused", fwd_fused), ("xla", fwd_xla)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, audio)
            _ = float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(
                f"round {r} merge={name:5s} B={b}: forward {1e3 * dt:7.2f} ms "
                f"({b / dt:6.0f} clips/s)",
                flush=True,
            )
    print(
        f"BEST fused {1e3 * best['fused']:.2f} vs xla {1e3 * best['xla']:.2f} ms "
        f"(delta {1e3 * (best['xla'] - best['fused']):+.2f} ms/{b})",
        flush=True,
    )


if __name__ == "__main__":
    main()
