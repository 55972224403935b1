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


def test_device_resident_input_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    sr = 16000
    data = (0.4 * rng.normal(size=(13, 5 * sr))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=8,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    a, b = r_host[ItemCategory.stem], r_dev[ItemCategory.stem]
    assert a.n == b.n == 13
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)


def test_device_resident_multiwindow_items():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    sr = 16000
    # 11 songs x 12.5 s -> 2 windows each (trailing half dropped)
    data = (0.4 * rng.normal(size=(11, int(12.5 * sr)))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=False,
        batch_size=16,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    assert r_host[ItemCategory.stem].n == r_dev[ItemCategory.stem].n == 22
    np.testing.assert_allclose(
        r_host[ItemCategory.stem].mean, r_dev[ItemCategory.stem].mean, rtol=1e-6
    )

def test_device_resident_without_embed_fn_falls_back():
    """Embedders without a pure embed_fn must still work with device-resident
    inputs (per-batch path instead of the fused loop)."""
    import jax.numpy as jnp
    from audio_metrics_tpu.models.dummy import _dummy_embed

    class HostDummy(DummyEmbedder):
        @property
        def embed_fn(self):
            return None

    rng = np.random.default_rng(3)
    data = (0.4 * rng.normal(size=(9, 5 * 16000))).astype(np.float32)
    kwargs = dict(
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=4,
    )
    r_fused = embedding_pipeline(jnp.asarray(data), embedder=DummyEmbedder(), **kwargs)
    r_plain = embedding_pipeline(jnp.asarray(data), embedder=HostDummy(), **kwargs)
    a, b = r_fused[ItemCategory.stem], r_plain[ItemCategory.stem]
    assert a.n == b.n == 9
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-7)

def test_hop_dur_overlapping_windows():
    """hop_dur < win_dur yields overlapping windows, identical between the
    host slicer path and the device-resident path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    sr = 16000
    # 10 s items, 5 s windows, 2.5 s hop -> 3 windows per item
    data = (0.4 * rng.normal(size=(5, 10 * sr))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=8,
        win_dur=5.0,
        hop_dur=2.5,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    a, b = r_host[ItemCategory.stem], r_dev[ItemCategory.stem]
    assert a.n == b.n == 15
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)


def test_hop_dur_through_audio_metrics():
    from audio_metrics_tpu import AudioMetrics

    rng = np.random.default_rng(5)
    sr = 16000
    data = (0.4 * rng.normal(size=(6, 10 * sr))).astype(np.float32)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=DummyEmbedder(),
        win_dur=5.0,
        hop_dur=2.5,
        input_sr=sr,
    )
    am.add_reference(data)
    assert am.stem_reference.n == 18  # 3 windows per 10 s item
    res = am.evaluate(data)
    assert res["fad"] < 1e-8 and res["coverage"] == 1.0
    # state round-trip carries hop_dur
    am.save_state("/tmp/hop_state.npz")
    am2 = AudioMetrics(metrics=["fad"], embedder=DummyEmbedder(), input_sr=sr)
    am2.load_state("/tmp/hop_state.npz")
    assert am2.hop_dur == 2.5
