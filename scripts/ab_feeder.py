"""Feeder-only A/B: Python generator chain vs the C++ NativeBatcher.

VERDICT r3 #6: the native batcher's value over the Python feeder has never
been demonstrated anywhere it could matter — the dev tunnel (27 MB/s) makes
E2E host-fed numbers transfer-bound either way.  This probe measures the
feeders in isolation (songs in -> padded batches out, NO device work) on
reference-shaped workloads:

  - 5 s windows at 48 kHz (the CLAP rate; reference embed.py:102,172)
  - APA reference mode: song shuffle + window shuffle + misaligned-pair
    construction + 3-category serialization (embed.py:154-201)
  - stems mode: windowing + batching only

The dev host has ONE core (os.cpu_count() == 1), so this measures the
single-core story; the native loader's worker threads cannot help here but
its C++ slicing/copy path and lock discipline still show up.  Record the
numbers in BASELINE.md and decide default-on vs insurance.

Run: python scripts/ab_feeder.py   (pure host; no TPU needed)
"""

import json
import os
import sys
import time
from itertools import tee

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from audio_metrics_tpu.ops.windowing import multi_audio_slicer, window_length
from audio_metrics_tpu.parallel.pipeline import (
    _bucketed_batches,
    _native_batches,
    serialize_items,
)
from audio_metrics_tpu.parallel.shuffle import shuffle_stream

SR = 48000
WIN_DUR = 5.0
SONG_SECONDS = 30.0
N_SONGS = int(os.environ.get("AB_SONGS", "64"))
BATCH = 32  # reference default (embed.py:102)
SEED = 7


def songs(stereo: bool):
    """Yield N_SONGS views of one shared buffer (no per-song alloc: the
    probe measures feeding, not numpy PRNG)."""
    rng = np.random.default_rng(0)
    n = int(SR * SONG_SECONDS)
    shape = (n, 2) if stereo else (n,)
    base = (0.25 * rng.normal(size=shape)).astype(np.float32)
    for _ in range(N_SONGS):
        yield base


def drain(batches):
    n_batches = 0
    n_windows = 0
    for _, audio, _cat, valid in batches:
        n_batches += 1
        n_windows += int(valid.sum())
    return n_batches, n_windows


def python_feeder(apa_mode):
    items = songs(stereo=apa_mode is not None)
    if apa_mode == "reference":
        items = shuffle_stream(items, buffer_size=100, seed=SEED)
    windows = multi_audio_slicer(items, WIN_DUR, sr=SR)
    if apa_mode == "reference":
        windows, shuffled = tee(windows)
        shuffled = shuffle_stream(shuffled, buffer_size=1000, min_age=100, seed=SEED)
    else:
        shuffled = None
    categorized = serialize_items(windows, shuffled, apa_mode, stems_mode=True)
    return _bucketed_batches(categorized, BATCH)


def native_feeder(apa_mode):
    return _native_batches(
        songs(stereo=apa_mode is not None),
        batch_size=BATCH,
        win_len=window_length(SR, WIN_DUR),
        apa_mode=apa_mode,
        stems_mode=True,
        seed=SEED,
        song_buffer=100,
        win_buffer=1000,
        win_min_age=100,
    )


def run(name, make, apa_mode, repeats=3):
    best = None
    counts = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        counts = drain(make(apa_mode))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n_batches, n_windows = counts
    return {
        "feeder": name,
        "apa_mode": apa_mode,
        "batches": n_batches,
        "windows": n_windows,
        "s": round(best, 3),
        "windows_per_s": round(n_windows / best, 1),
    }


def main():
    from audio_metrics_tpu.parallel.native_loader import native_available

    assert native_available(), "native loader unavailable"
    rows = []
    for apa_mode in (None, "reference"):
        rows.append(run("python", python_feeder, apa_mode))
        print(json.dumps(rows[-1]), flush=True)
        rows.append(run("native", native_feeder, apa_mode))
        print(json.dumps(rows[-1]), flush=True)
    for mode in (None, "reference"):
        py = next(r for r in rows if r["feeder"] == "python" and r["apa_mode"] == mode)
        na = next(r for r in rows if r["feeder"] == "native" and r["apa_mode"] == mode)
        print(
            json.dumps(
                {
                    "apa_mode": mode,
                    "native_speedup": round(
                        na["windows_per_s"] / py["windows_per_s"], 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
