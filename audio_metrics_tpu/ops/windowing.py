"""Fixed-length audio windowing.

Counterpart of reference src/audio_metrics/util/audio.py:1-14: non-overlapping
(hop == win unless hop_dur given) fixed-length windows, trailing remainder
dropped.  Host-side generators feed the batcher; the heavy per-window work
(resampling, mixing, embedding) happens on device with static shapes, which is
exactly why windows are cut *before* any device step.
"""

from __future__ import annotations

__all__ = ["audio_slicer", "multi_audio_slicer", "window_length"]


def window_length(sr: int | float, win_dur: float) -> int:
    return int(sr * win_dur)


def audio_slicer(item, win_dur, sr, hop_dur=None, drop_last=True):
    audio = item
    n = len(audio)
    win_len = window_length(sr, win_dur)
    if not drop_last:
        win_len = min(win_len, n)
    hop_len = win_len if hop_dur is None else int(sr * hop_dur)
    for i in range(0, n - win_len + 1, hop_len):
        yield audio[i : i + win_len]


def multi_audio_slicer(items, win_dur, sr, hop_dur=None, drop_last=True):
    for item in items:
        yield from audio_slicer(item, win_dur, sr, hop_dur, drop_last)
