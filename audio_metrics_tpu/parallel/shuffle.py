"""Streaming shuffle with a minimum-reemission-age constraint.

Counterpart of reference src/audio_metrics/util/shuffle.py:5-86.  A fixed-size
buffer is filled from the stream; each incoming item then evicts (and yields)
a uniformly-chosen buffered item from an *eligible* region that excludes the
``min_age`` most recently inserted slots, so a freshly inserted item cannot be
re-emitted immediately.  Used at song level (APA reference shuffling) and at
window level (misaligned-pair construction, embed.py:154-184).

This runs on host: it is a sequential O(1)-per-item index shuffle over Python
object handles — there is nothing for a TPU to accelerate here, and keeping it
on host preserves lazy streaming.
"""

from __future__ import annotations

import random

__all__ = ["shuffle_stream"]


def shuffle_stream(iterator, buffer_size=100, seed=None, min_age=0, desc=None):
    """Yield items of ``iterator`` in shuffled order using a bounded buffer.

    ``desc`` is accepted for signature parity with the reference (which wires
    it to a tqdm bar); progress reporting is handled by the pipeline here.
    """
    del desc
    iterator = iter(iterator)
    rng = random if seed is None else random.Random(seed)

    buffer = []
    indices = []
    for i in range(buffer_size):
        try:
            buffer.append(next(iterator))
        except StopIteration:
            break
        indices.append(i)

    total = len(buffer)
    if total == 0:
        return

    # keep at least one slot eligible
    effective_min_age = min(min_age, total - 1)
    n_eligible = total - effective_min_age
    offset = 0  # start of the eligible region (cyclic)

    for item in iterator:
        pos = rng.randrange(n_eligible)
        j = (offset + pos) % total
        idx = indices[j]
        yield buffer[idx]
        buffer[idx] = item
        indices[j], indices[offset] = indices[offset], indices[j]
        offset = (offset + 1) % total

    rng.shuffle(indices)
    for i in indices:
        yield buffer[i]
