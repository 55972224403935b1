"""Host-side streaming map utilities.

Fills the role of the reference's L3 host runtime (util/cpu_parallel.py,
util/gpu_parallel.py:79-118), which its example scripts use directly
(examples/2_musdb.py:40-41).  In this framework the embedding pipeline does
not need a host worker pool — device work is batched jitted programs — but
the utilities remain useful for custom preprocessing streams.

Both utilities share one design: a bounded in-flight window held in a single
deque, drained from the front in submission order.  Results are therefore
emitted **in input order** (unlike the reference, which emits in completion
order); backpressure comes from blocking on the oldest outstanding piece of
work once the window is full.

- :func:`cpu_parallel` — streaming parallel map over an iterator using a
  thread or process pool.
- :func:`device_map_stream` — the TPU analog of ``gpu_parallel``: map a
  jitted function over a stream of batches with double-buffered dispatch
  (jax's async dispatch overlaps host feeding with device compute; no
  free-device queue or model replicas are needed under SPMD).
"""

from __future__ import annotations

import concurrent.futures as cf
from collections import deque

__all__ = ["cpu_parallel", "device_map_stream"]


def _emit(fut, item, discard_input):
    """Resolve one finished piece of work into its output record."""
    result = fut.result()
    if discard_input:
        return result
    item.update(result)
    return item


def cpu_parallel(
    iterator,
    target,
    n_workers=0,
    desc=None,
    use_threads=False,
    discard_input=True,
    in_buffer_size=None,
    out_buffer_size=None,
):
    """Streaming parallel map with a bounded in-flight window.

    Accepts the reference's keyword surface (cpu_parallel.py:26) so caller
    code ports unchanged, but the semantics here are deliberately simpler:
    one submission-ordered window of at most ``in_buffer_size +
    out_buffer_size`` outstanding items, emitted strictly in input order.
    ``desc`` (a tqdm label in the reference) is accepted and ignored.
    """
    del desc
    pool_cls = cf.ThreadPoolExecutor if use_threads else cf.ProcessPoolExecutor
    fallback = 2 * max(n_workers, 1)
    window = (in_buffer_size if in_buffer_size is not None else fallback) + (
        out_buffer_size if out_buffer_size is not None else fallback
    )
    with pool_cls(max_workers=n_workers or None) as pool:
        inflight = deque()
        for item in iterator:
            inflight.append((pool.submit(target, item), item))
            # Emit any head-of-line work that already finished; once the
            # window is full, block on the oldest future (backpressure).
            while inflight and (len(inflight) > window or inflight[0][0].done()):
                yield _emit(*inflight.popleft(), discard_input)
        while inflight:
            yield _emit(*inflight.popleft(), discard_input)


def device_map_stream(batches, fn, depth: int = 2):
    """Map a jitted function over a stream of batches with a dispatch window.

    jax dispatch is asynchronous: keeping ``depth`` results in flight
    overlaps host-side batch preparation with device execution — the TPU
    replacement for the reference's per-GPU thread pool + free-device queue
    (gpu_parallel.py:20-118).  Yields results in order.
    """
    window = deque()
    for batch in batches:
        window.append(fn(batch))
        if len(window) > depth:
            yield window.popleft()
    while window:
        yield window.popleft()
