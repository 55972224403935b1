"""A/B the full CLAP forward (audio -> embedding) with/without the fused
audio->tokens frontend kernel (ops/frontend_fused.py).

Default mode runs BOTH variants in ONE process, alternating rounds
(fused, unfused, fused, unfused) by flipping models/clap._NO_FUSED_FRONTEND
between jits — relay weather hits both variants equally, so the delta is
decision-grade (CLAUDE.md: only same-process A/Bs are).  Reports min-of-
rounds per variant plus a checksum parity line.

    python scripts/ab_fused_frontend.py [batch] [iters] [rounds]

Audio is GENERATED ON DEVICE (same seed both variants) so no host->device
transfer rides the timed loop or the relay's 100 MB wedge limit; the loop
uses the N-call + trailing-scalar-sync slope method (CLAUDEmd).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp

import audio_metrics_tpu  # noqa: F401  (x64 + compile-cache setup)
from audio_metrics_tpu.models.clap import (
    SAMPLE_RATE,
    _clap_forward,
    init_projection_params,
)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, init_params


def main():
    from audio_metrics_tpu.models import clap as clap_mod

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cfg = HTSAT_BASE
    params = init_params(cfg, seed=0)
    params.update(init_projection_params(cfg, seed=0))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    n = 5 * SAMPLE_RATE
    audio = jax.jit(
        lambda: 0.2
        * jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)
    )()
    jax.block_until_ready(audio)

    # one jitted callable per variant; the module global is read at trace
    # time, so flip it around each jit.  Separate jits keep both variants'
    # executables alive across rounds (no recompiles after round 1).
    def make_fwd(no_fused):
        prev = clap_mod._NO_FUSED_FRONTEND
        clap_mod._NO_FUSED_FRONTEND = no_fused
        # _clap_forward is itself @jax.jit: its inner trace caches under the
        # FIRST flag value and would be inlined into both outer programs
        # (first run of this script measured delta 0.00 with bitwise-equal
        # outputs).  Clear it so each variant re-traces under its own flag.
        _clap_forward.clear_cache()
        try:
            fn = jax.jit(
                lambda p, a: _clap_forward(p, a, cfg, jnp.bfloat16)["embedding"]
            )
            out = fn(params, audio)  # compile now, under the right flag
            _ = float(jnp.sum(out))
        finally:
            clap_mod._NO_FUSED_FRONTEND = prev
        return fn, out

    t0 = time.perf_counter()
    fwd_fused, out_fused = make_fwd(False)
    warm_fused = time.perf_counter() - t0
    t0 = time.perf_counter()
    fwd_unfused, out_unfused = make_fwd(True)
    warm_unfused = time.perf_counter() - t0

    chk_f = float(jnp.mean(jnp.abs(out_fused)))
    chk_u = float(jnp.mean(jnp.abs(out_unfused)))
    rel = float(
        jnp.max(jnp.abs(out_fused - out_unfused))
        / (jnp.max(jnp.abs(out_unfused)) + 1e-12)
    )
    print(
        f"checksums fused {chk_f:.6f} unfused {chk_u:.6f} "
        f"max-rel-diff {rel:.2e}  [first-call fused {warm_fused:.1f} s, "
        f"unfused {warm_unfused:.1f} s]",
        flush=True,
    )

    best = {"fused": float("inf"), "unfused": float("inf")}
    for r in range(rounds):
        for name, fn in (("fused", fwd_fused), ("unfused", fwd_unfused)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, audio)
            _ = float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(
                f"round {r} {name:7s} B={b}: forward {1e3 * dt:7.2f} ms "
                f"({b / dt:6.0f} clips/s)",
                flush=True,
            )
    print(
        f"BEST fused {1e3 * best['fused']:.2f} ms vs unfused "
        f"{1e3 * best['unfused']:.2f} ms  (delta "
        f"{1e3 * (best['unfused'] - best['fused']):+.2f} ms/{b})",
        flush=True,
    )


if __name__ == "__main__":
    main()
