"""Per-stage pipeline profiler.

Counterpart of reference examples/benchmark_pipeline.py:37-66,167-305 (its
only profiling tool): run the embedding pipeline's stages sequentially and
materialized with wall-clock timers, print a stage table, songs/sec and a
device-utilization estimate.  Additionally supports capturing a
``jax.profiler`` trace for TensorBoard/XProf (--trace-dir).

Usage:
    python examples/benchmark_pipeline.py --n-songs 50 --embedder dummy
    python examples/benchmark_pipeline.py --embedder laion_clap_music \
        --batch-size 128 --trace-dir /tmp/am_trace
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Some environments preimport jax with a preselected platform; make the
# JAX_PLATFORMS env var authoritative even then.
import os

# Benchmark convenience: random weights are fine for throughput numbers.
os.environ.setdefault("AM_TPU_ALLOW_RANDOM_WEIGHTS", "1")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import argparse
import time
from dataclasses import dataclass, field
from itertools import tee

import numpy as np
import jax


@dataclass
class StageTimer:
    """Accumulates wall-clock time per named stage (reference :37-66)."""

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    def timed(self, name, iterator):
        while True:
            t0 = time.perf_counter()
            try:
                item = next(iterator)
            except StopIteration:
                return
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            yield item

    def report(self, total_time, n_songs, n_windows, device_stages=()):
        print(f"\n{'stage':<28}{'time (s)':>10}{'items':>8}{'share':>8}")
        print("-" * 54)
        for name, t in self.times.items():
            share = 100.0 * t / total_time if total_time else 0.0
            print(f"{name:<28}{t:>10.3f}{self.counts[name]:>8}{share:>7.1f}%")
        print("-" * 54)
        device_time = sum(self.times.get(s, 0.0) for s in device_stages)
        print(f"{'total':<28}{total_time:>10.3f}")
        print(f"\nsongs/sec:    {n_songs / total_time:.2f}")
        print(f"windows/sec:  {n_windows / total_time:.2f}")
        if device_time:
            print(f"device-stage share (util estimate): {100 * device_time / total_time:.1f}%")


def synthetic_songs(n_songs, duration_s, sr, stereo):
    rng = np.random.default_rng(0)
    n = int(duration_s * sr)
    for _ in range(n_songs):
        if stereo:
            yield (0.2 * rng.normal(size=(n, 2))).astype(np.float32)
        else:
            yield (0.2 * rng.normal(size=n)).astype(np.float32)


def run(args):
    from audio_metrics_tpu.data import AudioMetricsData
    from audio_metrics_tpu.models import get_embedder
    from audio_metrics_tpu.ops.mix import MIX_FUNCTIONS
    from audio_metrics_tpu.ops.windowing import multi_audio_slicer
    from audio_metrics_tpu.parallel.pipeline import (
        ItemCategory,
        _bucketed_batches,
        _category_moments,
        _device_mix,
        _device_resample,
        serialize_items,
    )
    from audio_metrics_tpu.parallel.shuffle import shuffle_stream

    embedder = get_embedder(args.embedder)
    mix_fn = MIX_FUNCTIONS[args.mix_function]
    apa = args.apa
    input_sr = args.input_sr or embedder.sr
    need_resample = input_sr != embedder.sr

    timer = StageTimer()
    t_start = time.perf_counter()

    songs = synthetic_songs(args.n_songs, args.song_duration, input_sr, stereo=apa)
    songs = timer.timed("generate", iter(songs))
    if apa:
        songs = timer.timed("shuffle songs", shuffle_stream(songs, buffer_size=100))
    windows = timer.timed(
        "window", multi_audio_slicer(songs, args.win_dur, sr=input_sr)
    )
    if apa:
        windows, shuffled = tee(windows)
        shuffled = shuffle_stream(shuffled, buffer_size=1000, min_age=100)
        items = serialize_items(windows, shuffled, apa_mode=True, stems_mode=True)
    else:
        items = serialize_items(windows, None, apa_mode=False, stems_mode=True)
    items = timer.timed("serialize", items)

    n_windows = 0
    moments_keys = (
        (int(ItemCategory.aligned), int(ItemCategory.misaligned), int(ItemCategory.stem))
        if apa
        else (int(ItemCategory.stem),)
    )
    amd = {k: AudioMetricsData(False) for k in moments_keys}

    def run_batches():
        nonlocal n_windows
        for kind, audio, category, valid in _bucketed_batches(items, args.batch_size):
            n_windows += int(valid.sum())
            if need_resample:
                t0 = time.perf_counter()
                audio = jax.block_until_ready(
                    _device_resample(audio, input_sr, embedder.sr)
                )
                timer.times["resample [dev]"] = (
                    timer.times.get("resample [dev]", 0.0) + time.perf_counter() - t0
                )
                timer.counts["resample [dev]"] = timer.counts.get("resample [dev]", 0) + 1
            if kind == "pair":
                t0 = time.perf_counter()
                mono = _device_mix(mix_fn, audio, sr=embedder.sr)
                timer.times["mix [dev]"] = (
                    timer.times.get("mix [dev]", 0.0) + time.perf_counter() - t0
                )
                timer.counts["mix [dev]"] = timer.counts.get("mix [dev]", 0) + 1
            else:
                mono = audio
            t0 = time.perf_counter()
            emb = embedder.forward({"audio": mono})["embedding"]
            moments = _category_moments(emb, category, valid, moments_keys)
            moments = jax.tree.map(np.asarray, moments)
            timer.times["embed+moments [dev]"] = (
                timer.times.get("embed+moments [dev]", 0.0) + time.perf_counter() - t0
            )
            timer.counts["embed+moments [dev]"] = (
                timer.counts.get("embed+moments [dev]", 0) + 1
            )
            for k in moments_keys:
                n, s1, s2 = moments[k]
                amd[k].add_moments(n, s1, s2)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            run_batches()
        print(f"jax profiler trace written to {args.trace_dir}")
    else:
        run_batches()

    total = time.perf_counter() - t_start
    timer.report(
        total,
        args.n_songs,
        n_windows,
        device_stages=("resample [dev]", "mix [dev]", "embed+moments [dev]"),
    )
    for k, a in amd.items():
        print(f"category {k}: n={len(a)}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-songs", type=int, default=20)
    parser.add_argument("--song-duration", type=float, default=30.0)
    parser.add_argument("--win-dur", type=float, default=5.0)
    parser.add_argument("--input-sr", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--embedder", default="dummy")
    parser.add_argument("--mix-function", default="L0")
    parser.add_argument("--apa", action="store_true", help="profile the APA path")
    parser.add_argument("--trace-dir", default=None, help="write a jax.profiler trace")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
