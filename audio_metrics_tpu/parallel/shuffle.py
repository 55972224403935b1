"""Streaming shuffle with a minimum-reemission-age constraint.

Behavioral counterpart of reference src/audio_metrics/util/shuffle.py:5-86,
rebuilt around a different data structure: instead of a cyclic eligible
window over an index array, we keep two explicit containers —

- ``pool``: items old enough to be emitted (unordered; O(1) swap-pop),
- ``aging``: a FIFO of the ``min_age`` most recent insertions, which are
  temporarily protected from emission.

Each incoming stream item displaces one uniformly-chosen pool item (which is
yielded), enters the aging FIFO, and pushes the FIFO's oldest entry into the
pool.  The guarantee this provides — an item is never re-emitted within
``min_age`` subsequent insertions of entering the buffer — is what the
misaligned-pair construction relies on (a window is never paired with
itself); tests/test_shuffle.py pins it directly.

This runs on host: it is a sequential O(1)-per-item shuffle over Python
object handles — there is nothing for a TPU to accelerate here, and keeping
it on host preserves lazy streaming.
"""

from __future__ import annotations

import itertools
import random
from collections import deque

__all__ = ["shuffle_stream"]


def shuffle_stream(iterator, buffer_size=100, seed=None, min_age=0, desc=None):
    """Yield items of ``iterator`` in shuffled order using a bounded buffer.

    ``desc`` is accepted for signature parity with the reference (which wires
    it to a tqdm bar); progress reporting is handled by the pipeline here.
    """
    del desc
    rng = random if seed is None else random.Random(seed)
    iterator = iter(iterator)

    held = list(itertools.islice(iterator, buffer_size))
    if not held:
        return

    # Protect at most len(held)-1 recent insertions so the pool is never
    # empty; seed the FIFO with the newest items of the warmup fill.
    protected = min(min_age, len(held) - 1)
    aging = deque(held[len(held) - protected:])
    pool = held[: len(held) - protected]

    for item in iterator:
        r = rng.randrange(len(pool))
        pool[r], pool[-1] = pool[-1], pool[r]
        yield pool.pop()
        aging.append(item)
        pool.append(aging.popleft())

    tail = pool + list(aging)
    rng.shuffle(tail)
    yield from tail
