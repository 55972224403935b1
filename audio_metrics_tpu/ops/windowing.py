"""Fixed-length audio windowing.

Behavioral counterpart of reference src/audio_metrics/util/audio.py:1-14:
fixed-length windows at a fixed hop (hop == win unless ``hop_dur`` is given),
with any partial trailing window dropped.  Host-side generators feed the
batcher; the heavy per-window work (resampling, mixing, embedding) happens on
device with static shapes, which is exactly why windows are cut *before* any
device step.

Structured as a sample-domain core (`slice_windows`) plus duration->samples
adapters, so callers that already think in samples (the native loader, the
device-resident paths) can skip the float conversion.
"""

from __future__ import annotations

__all__ = ["audio_slicer", "multi_audio_slicer", "window_length", "slice_windows"]


def window_length(sr: int | float, win_dur: float) -> int:
    return int(sr * win_dur)


def slice_windows(audio, win_len: int, hop_len: int):
    """Yield ``win_len``-sample views of ``audio`` every ``hop_len`` samples.

    A trailing segment shorter than ``win_len`` is never emitted.
    """
    end = len(audio) - win_len
    start = 0
    while start <= end:
        yield audio[start : start + win_len]
        start += hop_len


def audio_slicer(item, win_dur, sr, hop_dur=None, drop_last=True):
    win_len = window_length(sr, win_dur)
    if not drop_last:
        # Reference quirk kept: a too-short signal yields itself whole
        # (window shrinks to the signal) instead of being dropped.
        win_len = min(win_len, len(item))
    hop_len = win_len if hop_dur is None else window_length(sr, hop_dur)
    return slice_windows(item, win_len, hop_len)


def multi_audio_slicer(items, win_dur, sr, hop_dur=None, drop_last=True):
    for item in items:
        yield from audio_slicer(item, win_dur, sr, hop_dur, drop_last)
