"""Stream-shuffle semantics (reference util/shuffle.py:5-86 behavior)."""

import collections

import numpy as np
import pytest

from audio_metrics_tpu.parallel.shuffle import shuffle_stream


def test_yields_all_items_exactly_once():
    items = list(range(1000))
    out = list(shuffle_stream(iter(items), buffer_size=64, seed=0))
    assert sorted(out) == items
    assert out != items  # actually shuffled


def test_small_input_fits_in_buffer():
    items = list(range(10))
    out = list(shuffle_stream(iter(items), buffer_size=100, seed=1))
    assert sorted(out) == items


def test_empty_input():
    assert list(shuffle_stream(iter([]), buffer_size=10)) == []


def test_seed_reproducible():
    items = list(range(500))
    a = list(shuffle_stream(iter(items), buffer_size=32, seed=42))
    b = list(shuffle_stream(iter(items), buffer_size=32, seed=42))
    c = list(shuffle_stream(iter(items), buffer_size=32, seed=43))
    assert a == b
    assert a != c


def test_min_age_constraint():
    """An item must not be re-emitted within min_age insertions of entering
    the buffer (the property the misaligned-pair construction relies on:
    a window is never paired with itself)."""
    n, buf, min_age = 2000, 50, 20
    items = list(range(n))
    out = list(shuffle_stream(iter(items), buffer_size=buf, seed=7, min_age=min_age))
    assert sorted(out) == items
    # item i enters the buffer at insertion step max(0, i - buf)... for the
    # streaming phase, item i (inserted at step i) may be emitted at step j
    # (j-th eviction) only if it has aged min_age steps.  Streaming emissions
    # are steps buf..n-1; item emitted at step j was inserted at some i;
    # the constraint is j - i >= min_age for items inserted after warmup.
    emit_step = {item: step for step, item in enumerate(out)}
    for item in range(buf, n - buf):  # streamed insertions (exclude drain tail)
        insert_step = item - buf  # eviction count when this item entered
        if emit_step[item] < n - buf:  # emitted during streaming
            age = emit_step[item] - insert_step
            assert age >= min_age, (item, age)


def test_shuffle_is_uniformish():
    """Positions should be spread out (not a rigid permutation window)."""
    n = 3000
    out = list(shuffle_stream(iter(range(n)), buffer_size=500, seed=3))
    displacement = [abs(i - v) for i, v in enumerate(out)]
    assert np.mean(displacement) > 50
