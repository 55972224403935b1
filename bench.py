"""E2E benchmark: 5 s clips -> CLAP(HTSAT-base) embeddings -> FAD+KD+PRDC.

Runs the real public-API path (AudioMetrics.add_reference / evaluate) with
the flagship embedder (bf16 matmuls, random weights — checkpoint-identical
FLOPs) on synthetic 48 kHz audio.  The headline follows the BASELINE.json
north star ("embedding extraction, distance accumulation and sqrtm all run
on-device so eval sets never round-trip to host"): the candidate set is
device-resident, so the measured number is embed->metric throughput, not
host-interconnect bandwidth.  A host-fed run is reported in the detail line.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "clips/s/chip", "vs_baseline": r}

``python bench.py --precompile`` runs ONLY the warmup phase (identical
shapes, so every jitted program lands in the persistent compile cache) and
exits — run it ahead of time and the next bench run starts warm (~68 s
instead of the ~6.5 min cold-cache first run through the remote relay).
"""

import json
import os
import sys
import time

import numpy as np

# host-fed configuration: int16 transfer encoding.  The C++ batcher is NOT
# opted in: feeder-only A/B (scripts/ab_feeder.py, BASELINE.md) measured the
# Python generator chain 2.8-5.3x faster on this single-core host — the
# native loader's worker-thread pipeline only pays when spare cores exist
# (set AM_TPU_NATIVE_LOADER=1 on multi-core PCIe hosts).
os.environ.setdefault("AM_TPU_TRANSFER_INT16", "1")
# persistent XLA compile cache: repeat bench runs skip the ~2 min warmup
# compiles (measurement happens after warmup either way)
os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

N_CLIPS = int(os.environ.get("BENCH_CLIPS", "2048"))
N_CLIPS_HOST = int(os.environ.get("BENCH_CLIPS_HOST", "128"))
BENCH_MODE = os.environ.get("BENCH_MODE", "stems")  # "stems" | "apa" | "vggish"
# B=128 amortizes best for BOTH nets on v5e since the reduce-free-softmax
# + v4-fusion round (CLAP forward 36.7 ms/128 = 18.4/64 vs 19.7 at B=64;
# earlier kernels favored 64: 2x35.3 vs 77.2)
# loop-batch sweep for the 2048-clip fused loop (scripts/probe_loop_batch.py,
# round 4, same-process alternating rounds): 128 549.8 / 256 532.6 / 512
# 529.2 ms — fewer loop steps, same per-clip math; the host-fed path still
# transfers in <=64-clip slices either way, so big batches stay relay-safe.
# Round-5 extension (512/1024/2048, alternating best-of-4): 512 532.2 /
# 1024 533.6 / 2048 526.5 ms — the whole-set one-step "loop" wins ~1%
# (no dynamic slice/update steps).  Host-fed batches upload real rows
# only (device-side padding), so the big batch stays relay-safe there too.
_DEFAULT_BATCH = "2048"
BATCH_SIZE = int(os.environ.get("BENCH_BATCH", _DEFAULT_BATCH))
if BENCH_MODE == "vggish" and "BENCH_CLIPS" not in os.environ:
    N_CLIPS = 8192  # VGGish evaluates 2048 clips in ~0.3 s; a bigger set
    # keeps the measurement above relay timing jitter
SR = 48000
CLIP_SECONDS = 5.0
NORTH_STAR = 5000.0
PRECOMPILE = "--precompile" in sys.argv


def _cache_state():
    """cold/warm compile-cache indicator for the detail line."""
    from pathlib import Path

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        Path.home() / ".cache" / "audio_metrics_tpu" / "xla_cache"
    )
    try:
        return "warm" if any(Path(d).iterdir()) else "cold"
    except OSError:
        return "cold"


# Warmup attribution (VERDICT r2 #3: the driver-observed warmup ranged
# 46-544 s with a warm cache; every regression must be attributable).
# jax emits per-phase durations: jaxpr trace + MLIR lowering are host
# single-core Python/C++ work (contention-sensitive), backend_compile is
# the XLA compile (should be ~0 on a warm persistent cache).
_JAX_PHASES = {}


def _phase_listener(event, duration, **_kw):
    key = event.rsplit("/", 1)[-1].replace("_duration", "")
    _JAX_PHASES[key] = _JAX_PHASES.get(key, 0.0) + duration


def _warmup_breakdown(total_s, t_add, t_eval):
    tracked = sum(_JAX_PHASES.values())
    return {
        "total_s": round(total_s, 2),
        "add_reference_s": round(t_add, 2),
        "evaluate_s": round(t_eval, 2),
        **{k: round(v, 2) for k, v in sorted(_JAX_PHASES.items())},
        "untracked_s": round(max(0.0, total_s - tracked), 2),
    }


# Per-program first-call ledger (VERDICT r3 #4): every top-level executable's
# FIRST invocation routes through jax's Python pjit slow path
# (_pjit_call_impl_python: trace/compile-or-cache-load + first dispatch);
# later calls hit the C++ fastpath cache and never come back here.  Timing
# that path per program name enumerates exactly the "16 top-level
# executables x relay-weather first-call setup" the round-3 census found,
# so a slow warmup is attributable to named programs.  Costs nothing after
# warmup.  NOTE: dispatch is async — a program whose executable upload is
# deferred shows up in the first *blocking* entry after it instead.
_PROGRAM_LEDGER: list = []
# When True (warmup only), each first call BLOCKS on its outputs before the
# ledger records it: async dispatch otherwise defers the relay executable
# registration — the dominant warmup mass (BASELINE.md round-3 attribution)
# — into whatever transfer blocks next, so the r4 ledger named only ~35 s
# of 159 s untracked.  device_get is the block (CLAUDE.md:
# block_until_ready does not reliably block through the relay); outputs are
# bounded (largest: the fused loop's ~5 MB buf+moments, ~0.2 s at relay
# bandwidth), and the mode is off for every timed run.
_LEDGER_SYNC = [False]
_LEDGER_IN_SYNC = [False]  # recursion guard: device_get can dispatch


def _install_program_ledger():
    try:
        import jax
        import jax._src.pjit as _pjit

        orig = _pjit._pjit_call_impl_python

        def timed(*args, **kwargs):
            t0 = time.perf_counter()
            out = orig(*args, **kwargs)
            if _LEDGER_SYNC[0] and not _LEDGER_IN_SYNC[0]:
                _LEDGER_IN_SYNC[0] = True
                try:
                    leaves = [
                        x
                        for x in jax.tree_util.tree_leaves(out)
                        if hasattr(x, "nbytes") and x.nbytes <= (32 << 20)
                    ]
                    jax.device_get(leaves)
                except Exception:
                    pass
                finally:
                    _LEDGER_IN_SYNC[0] = False
            dt = time.perf_counter() - t0
            _PROGRAM_LEDGER.append((kwargs.get("name", "?"), dt))
            return out

        _pjit._pjit_call_impl_python = timed
    except Exception:  # internal API moved: ledger degrades to empty
        pass


def _program_ledger_summary(top=20):
    agg: dict = {}
    for name, dt in _PROGRAM_LEDGER:
        n, tot = agg.get(name, (0, 0.0))
        agg[name] = (n + 1, tot + dt)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    return {
        "n_first_calls": len(_PROGRAM_LEDGER),
        "n_programs": len(agg),
        "top": [
            {"name": k, "calls": n, "s": round(tot, 2)}
            for k, (n, tot) in rows[:top]
            if tot >= 0.05
        ],
    }




def _clap_embedder():
    """Real checkpoint when resolvable (AM_TPU_CKPT_DIR / cache / network),
    seeded random weights otherwise — the detail line records which."""
    from audio_metrics_tpu.models.clap import (
        LaionCLAP,
        LAION_CLAP_MUSIC_CHECKPOINT_URL,
    )
    from audio_metrics_tpu.utils.get_url import resolve_checkpoint

    ck = resolve_checkpoint(LAION_CLAP_MUSIC_CHECKPOINT_URL)
    emb = LaionCLAP(
        ckpt=ck, compute_dtype="bfloat16", allow_random_weights=ck is None
    )
    emb.real_weights = ck is not None
    return emb


def _vggish_embedder():
    from audio_metrics_tpu.models.vggish import VGGish, VGGISH_CHECKPOINT_URL
    from audio_metrics_tpu.utils.get_url import resolve_checkpoint

    ck = resolve_checkpoint(VGGISH_CHECKPOINT_URL)
    emb = VGGish(
        ckpt=ck, compute_dtype="bfloat16", allow_random_weights=ck is None
    )
    emb.real_weights = ck is not None
    return emb

def main_apa():
    """APA E2E: context+stem pairs -> L0 loudness mix on device -> CLAP ->
    APA+FAD (BASELINE.json config 3).  Pairs are device-resident (generated
    on device), exercising the device-resident APA fast path — the
    measurement is mix+embed+metric compute, not host-link bandwidth."""
    import jax
    import jax.numpy as jnp

    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.models.clap import LaionCLAP

    n = int(SR * CLIP_SECONDS)
    n_pairs = int(os.environ.get("BENCH_PAIRS", "1024"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = jax.jit(  # fused scale: no set-sized transient (see main())
        lambda k: 0.2 * jax.random.normal(k, (n_pairs, n, 2), jnp.float32)
    )
    reference = gen(k1)
    candidate = gen(k2)
    jax.block_until_ready((reference, candidate))

    am = AudioMetrics(
        metrics=["apa", "fad"],
        embedder=_clap_embedder(),
        mix_function="L0",
        win_dur=CLIP_SECONDS,
        input_sr=SR,
        # cap at the per-category window count (the fused loop pads N up
        # to a batch multiple) and at 512 — the proven APA HBM envelope:
        # each category's windows + mixes stay resident during evaluate
        batch_size=min(BATCH_SIZE, n_pairs, 512),
    )
    t0 = time.perf_counter()
    am.add_reference(reference)
    am.evaluate(candidate)
    warmup_s = time.perf_counter() - t0
    am.reset_reference()
    if PRECOMPILE:
        print(json.dumps({"precompiled": "apa", "warmup_s": round(warmup_s, 2)}))
        return

    t0 = time.perf_counter()
    am.add_reference(reference)
    t_ref = time.perf_counter() - t0
    t_evals = []
    for _ in range(3):  # best of 3: relay jitter on a ~1 s measurement
        t0 = time.perf_counter()
        result = am.evaluate(candidate)
        t_evals.append(time.perf_counter() - t0)
    t_eval = min(t_evals)
    pairs_per_sec = n_pairs / t_eval
    print(
        json.dumps(
            {
                "metric": "5s-pairs/sec/chip APA E2E (L0 mix + CLAP bf16, device-resident pairs)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_sec / NORTH_STAR, 4),
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "mode": "apa",
                    "n_pairs": n_pairs,
                    "batch_size": am.batch_size,
                    "warmup_s": round(warmup_s, 2),
                    "add_reference_s": round(t_ref, 2),
                    "evaluate_s": round(t_eval, 2),
                    "metrics": {k: float(v) for k, v in result.items()},
                }
            }
        ),
        file=sys.stderr,
    )


def main():
    import jax
    import jax.numpy as jnp

    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.metrics.fad import _fad_tail_mode
    from audio_metrics_tpu.models.clap import LaionCLAP

    rng = np.random.default_rng(0)
    n = int(SR * CLIP_SECONDS)

    embedder = _clap_embedder()
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=embedder,
        mix_function="L0",
        win_dur=CLIP_SECONDS,
        input_sr=SR,
        # cap at the set size: the fused loop pads N up to a batch multiple
        batch_size=min(BATCH_SIZE, N_CLIPS),
    )

    # reference + candidate sets generated on device (jax PRNG).
    # BENCH_CLIPS_REF decouples the reference size (default: same as the
    # candidate) — an 8192+8192 f32 pair would exceed v5e HBM, while
    # ref 2048 + cand 8192 fits and still drives the N^2 metric tails at
    # 2048 x 8192 (the scaling configuration recorded in BASELINE.md).
    n_ref = int(os.environ.get("BENCH_CLIPS_REF", str(N_CLIPS)))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # jit fuses the 0.2x scale into the PRNG output: the eager form holds
    # TWO set-sized arrays during generation, which OOMs v5e HBM at the
    # 8192-clip scaling configuration (2x 7.9 GB transient)
    gen = jax.jit(
        lambda k, m: 0.2 * jax.random.normal(k, (m, n), jnp.float32),
        static_argnums=1,
    )
    reference = gen(k1, n_ref)
    candidate = gen(k2, N_CLIPS)
    jax.block_until_ready((reference, candidate))

    # warmup: compile embed/moment programs AND the metric programs (KD
    # subset loop, PRDC kernels, FAD) via one full add_reference + evaluate
    import jax.monitoring

    jax.monitoring.register_event_duration_secs_listener(_phase_listener)
    _install_program_ledger()
    _LEDGER_SYNC[0] = True
    t0 = time.perf_counter()
    am.add_reference(reference)
    t_wadd = time.perf_counter() - t0
    am.evaluate(candidate)
    warmup_s = time.perf_counter() - t0
    _LEDGER_SYNC[0] = False
    breakdown = _warmup_breakdown(warmup_s, t_wadd, warmup_s - t_wadd)
    breakdown["program_first_calls"] = _program_ledger_summary()
    am.reset_reference()
    if PRECOMPILE:
        print(
            json.dumps(
                {
                    "precompiled": "stems",
                    "warmup_s": round(warmup_s, 2),
                    "warmup_breakdown": breakdown,
                }
            )
        )
        return

    t0 = time.perf_counter()
    am.add_reference(reference)
    t_ref = time.perf_counter() - t0

    # best of N (default 5) timed evaluates: the dev relay adds run-to-run
    # jitter on a <1 s measurement (BASELINE.md records a 1400-1485 spread
    # for identical code); min is the standard jitter-robust throughput
    # estimator, and since the second-evaluate stall fix made consecutive
    # evaluates flat, extra samples cost ~0.65 s each and only tighten it
    t_evals = []
    for _ in range(int(os.environ.get("BENCH_EVAL_RUNS", "5"))):
        t0 = time.perf_counter()
        result = am.evaluate(candidate)
        t_evals.append(time.perf_counter() - t0)
    t_eval = min(t_evals)
    clips_per_sec = N_CLIPS / t_eval
    eval_timings = {k: round(v, 3) for k, v in am.timings.items()}

    # one diagnostic evaluate with the pipeline-end sync re-inserted
    # (AM_TPU_TIMING_SYNC): the default eigdev mode drains the whole stream
    # in finalize_pull, so this run is the one that can attribute evaluate
    # time to pipeline vs tail (VERDICT r3 #7).  Untimed: the extra sync
    # costs a small pull, so it must not touch the headline.
    os.environ["AM_TPU_TIMING_SYNC"] = "1"
    try:
        am.evaluate(candidate)
        timings_attributed = {k: round(v, 3) for k, v in am.timings.items()}
    finally:
        del os.environ["AM_TPU_TIMING_SYNC"]

    # host-fed comparison (int16 transfer, native batcher): measured on the
    # ingest+embed path (add_reference) so differing-N metric compiles don't
    # pollute the number
    host_candidate = np.asarray(candidate[:N_CLIPS_HOST])
    am.add_reference(host_candidate[: BATCH_SIZE + 1])  # warm the host path
    t0 = time.perf_counter()
    am.add_reference(host_candidate)
    t_host = time.perf_counter() - t0

    out = {
        "metric": "5s-clips/sec/chip embed->metric E2E (CLAP HTSAT-base bf16, FAD+KD+PRDC, device-resident eval set)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / NORTH_STAR, 4),
    }
    print(json.dumps(out))
    print(
        json.dumps(
            {
                "detail": {
                    "n_clips": N_CLIPS,
                    "batch_size": am.batch_size,
                    "warmup_s": round(warmup_s, 2),
                    "warmup_breakdown": breakdown,
                    "add_reference_s": round(t_ref, 2),
                    "evaluate_s": round(t_eval, 2),
                    "evaluate_s_runs": [round(t, 3) for t in t_evals],
                    "host_fed_clips_per_s": round(N_CLIPS_HOST / t_host, 2),
                    "eval_timings": eval_timings,
                    "eval_timings_attributed": timings_attributed,
                    "real_weights": bool(embedder.real_weights),
                    "gelu_mode": os.environ.get("AM_TPU_GELU", "poly"),
                    "fad_tail_mode": _fad_tail_mode(),
                    "compile_cache_at_start": _CACHE_STATE,
                    "metrics": {k: float(v) for k, v in result.items()},
                }
            }
        ),
        file=sys.stderr,
    )


def main_vggish():
    """VGGish E2E (BASELINE.json config 2 analog): 5 s stems -> VGGish bf16
    -> FAD+KD+PRDC, device-resident."""
    import jax
    import jax.numpy as jnp

    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.models.vggish import VGGish

    sr = 16000
    n = int(sr * CLIP_SECONDS)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    gen = jax.jit(  # fused scale: no set-sized transient (see main())
        lambda k: 0.2 * jax.random.normal(k, (N_CLIPS, n), jnp.float32)
    )
    reference = gen(k1)
    candidate = gen(k2)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=_vggish_embedder(),
        mix_function="L0",
        win_dur=CLIP_SECONDS,
        input_sr=sr,
        # 512 cap: the VGGish conv stack keeps several f32 layer buffers
        # live per batch — batch 2048 on the 8192-clip set OOM'd v5e HBM
        # on top of the resident waveforms (2026-08-21)
        batch_size=min(BATCH_SIZE, N_CLIPS, 512),
    )
    t0 = time.perf_counter()
    am.add_reference(reference)
    am.evaluate(candidate)
    warmup_s = time.perf_counter() - t0
    am.reset_reference()
    if PRECOMPILE:
        print(json.dumps({"precompiled": "vggish", "warmup_s": round(warmup_s, 2)}))
        return
    t0 = time.perf_counter()
    am.add_reference(reference)
    t_ref = time.perf_counter() - t0
    t_evals = []
    for _ in range(3):  # best of 3: relay jitter on a <1 s measurement
        t0 = time.perf_counter()
        result = am.evaluate(candidate)
        t_evals.append(time.perf_counter() - t0)
    t_eval = min(t_evals)
    print(
        json.dumps(
            {
                "metric": "5s-clips/sec/chip embed->metric E2E (VGGish bf16, FAD+KD+PRDC, device-resident)",
                "value": round(N_CLIPS / t_eval, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(N_CLIPS / t_eval / NORTH_STAR, 4),
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "mode": "vggish",
                    "n_clips": N_CLIPS,
                    "batch_size": am.batch_size,
                    "warmup_s": round(warmup_s, 2),
                    "add_reference_s": round(t_ref, 2),
                    "evaluate_s": round(t_eval, 2),
                    "metrics": {k: float(v) for k, v in result.items()},
                }
            }
        ),
        file=sys.stderr,
    )


_CACHE_STATE = _cache_state()

if __name__ == "__main__":
    if BENCH_MODE == "apa":
        main_apa()
    elif BENCH_MODE == "vggish":
        main_vggish()
    else:
        main()
