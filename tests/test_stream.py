"""Streaming-map utility tests (reference util/cpu_parallel semantics)."""

import numpy as np

from audio_metrics_tpu.parallel.stream import cpu_parallel, device_map_stream


def test_cpu_parallel_threads():
    out = sorted(cpu_parallel(range(50), lambda x: x * 2, n_workers=4, use_threads=True))
    assert out == [2 * i for i in range(50)]


def test_cpu_parallel_keeps_inputs():
    items = [{"x": i} for i in range(10)]
    results = list(
        cpu_parallel(
            iter(items),
            lambda d: {"y": d["x"] + 1},
            n_workers=2,
            use_threads=True,
            discard_input=False,
        )
    )
    assert all(r["y"] == r["x"] + 1 for r in results)


def test_device_map_stream_ordered():
    import jax

    fn = jax.jit(lambda x: x * 2)
    batches = [np.full((4,), i, np.float32) for i in range(10)]
    out = list(device_map_stream(iter(batches), fn, depth=3))
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o), batches[i] * 2)
