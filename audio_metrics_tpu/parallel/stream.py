"""Host-side streaming map utilities.

Counterparts of reference util/cpu_parallel.py:7-62 and
util/gpu_parallel.py:79-118, which the reference's example scripts use
directly (examples/2_musdb.py:40-41).  In this framework the embedding
pipeline does not need them — device work is batched jitted programs — but
the utilities remain useful for custom preprocessing streams:

- :func:`cpu_parallel` — bounded-buffer streaming map over an iterator using
  a thread or process pool (backpressure at ``in_buffer_size``).
- :func:`device_map_stream` — the TPU analog of ``gpu_parallel``: map a
  jitted function over a stream of batches with double-buffered dispatch
  (jax's async dispatch overlaps host feeding with device compute; no
  free-device queue or model replicas are needed under SPMD).
"""

from __future__ import annotations

import concurrent.futures as cf
from collections import deque

__all__ = ["cpu_parallel", "device_map_stream", "handle_futures"]


def handle_futures(futures, discard_inputs, size=None):
    """Yield results of completed futures, draining down to ``size``
    (reference cpu_parallel.py:7-24)."""
    for fut in cf.as_completed(futures):
        if size is not None and len(futures) < size:
            break
        ready_result = fut.result()
        ready_item = futures.pop(fut)
        if discard_inputs:
            yield ready_result
        else:
            ready_item.update(ready_result)
            yield ready_item


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
    """Streaming parallel map with bounded in/out buffers.

    Signature-compatible with the reference (cpu_parallel.py:26-62); ``desc``
    is accepted for parity and ignored.
    """
    del desc
    executor_cls = cf.ThreadPoolExecutor if use_threads else cf.ProcessPoolExecutor
    if in_buffer_size is None:
        in_buffer_size = 2 * max(n_workers, 1)
    if out_buffer_size is None:
        out_buffer_size = 2 * max(n_workers, 1)
    with executor_cls(max_workers=n_workers or None) as pool:
        futures = {}
        ready = {}
        for item in iterator:
            fut = pool.submit(target, item)
            futures[fut] = None if discard_input else item
            if len(futures) >= in_buffer_size:
                done, _ = cf.wait(futures, return_when=cf.FIRST_COMPLETED)
                for fut in done:
                    ready[fut] = futures.pop(fut)
            yield from handle_futures(ready, discard_input, out_buffer_size)
        yield from handle_futures(ready, discard_input)
        yield from handle_futures(futures, discard_input)


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
