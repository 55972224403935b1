"""Same-process A/B: host-fed ingest with device-side padding (new default)
vs host-side padding of the partial final batch (round-4 behavior).

Diagnoses VERDICT r4 item 2: BENCH_r04.json recorded host_fed_clips_per_s
collapsing 17.8 -> 4.54 after the loop batch default moved to 512.  The
suspect is not the staged upload itself (same bytes, same serialized relay
stream) but the host-side zero-padding of the one partial batch: 128 real
clips padded to 512 rows uploads 4.07x the bytes through the ~27 MB/s
relay.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_hostfed.py
[n_clips] [batch_size] [rounds]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from audio_metrics_tpu import AudioMetrics  # noqa: E402
import audio_metrics_tpu.parallel.pipeline as pl  # noqa: E402
from bench import _clap_embedder  # noqa: E402

SR = 48000
rng = np.random.default_rng(0)
audio = (0.2 * rng.standard_normal((N_CLIPS, 5 * SR))).astype(np.float32)

am = AudioMetrics(
    metrics=["fad"],
    embedder=_clap_embedder(),
    mix_function="L0",
    win_dur=5.0,
    input_sr=SR,
    batch_size=BATCH,
)

_orig = pl._bucketed_batches


def _force_host_pad(items, batch_size, pad_host=False):
    return _orig(items, batch_size, pad_host=True)


def run(mode):
    pl._bucketed_batches = _force_host_pad if mode == "hostpad" else _orig
    am.reset_reference()
    t0 = time.perf_counter()
    am.add_reference(audio)
    dt = time.perf_counter() - t0
    return dt


# warmup both variants (compile + first relay setup)
for m in ("devpad", "hostpad"):
    dt = run(m)
    print(f"warmup {m}: {dt:.2f}s", flush=True)

res = {"devpad": [], "hostpad": []}
for r in range(ROUNDS):
    for m in ("devpad", "hostpad"):
        dt = run(m)
        res[m].append(dt)
        print(f"round {r} {m}: {dt:.2f}s = {N_CLIPS/dt:.2f} clips/s", flush=True)

pl._bucketed_batches = _orig
for m, ts in res.items():
    best = min(ts)
    print(
        f"{m}: best {best:.2f}s = {N_CLIPS/best:.2f} clips/s "
        f"(runs {[round(t, 2) for t in ts]})"
    )
