"""Pipeline extras: int16 transfer mode, progress-free operation."""

import os

import numpy as np

from audio_metrics_tpu.parallel.pipeline import embedding_pipeline, ItemCategory
from audio_metrics_tpu.models import DummyEmbedder


def mix_func(audio, sr=None):
    return audio.mean(axis=1)


def test_int16_transfer_close_to_f32(monkeypatch):
    rng = np.random.default_rng(0)
    data = (0.5 * rng.normal(size=(12, 5 * 16000))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=False,
        batch_size=8,
    )
    r32 = embedding_pipeline(data, **kwargs)

    monkeypatch.setenv("AM_TPU_TRANSFER_INT16", "1")
    r16 = embedding_pipeline(data, **kwargs)

    a, b = r32[ItemCategory.stem], r16[ItemCategory.stem]
    assert a.n == b.n
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-2, atol=1e-3)
