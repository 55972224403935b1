"""Deterministic fake embedder for tests and pipeline benchmarks.

Mirrors the reference test fixture (tests/test_audio_metrics.py:7-24):
``embedding = outer(1e3 * std(audio, axis=1), arange(dim))`` — deterministic,
data-dependent, no checkpoint, no network.  Unlike the reference (whose
pipeline still demands a CUDA device even with the dummy,
gpu_parallel.py:27-28), this one runs anywhere jax runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Embedder

__all__ = ["DummyEmbedder"]


@jax.jit
def _dummy_embed(audio):
    audio = audio.astype(jnp.float32)
    scale = 1e3 * jnp.std(audio, axis=1)
    return jnp.outer(scale, jnp.arange(10, dtype=jnp.float32))


class DummyEmbedder(Embedder):
    names = ("embedding",)

    def __init__(self, sr: int = 16000):
        self._sr = sr

    @property
    def sr(self) -> int:
        return self._sr

    def forward(self, data: dict) -> dict:
        return {"embedding": _dummy_embed(jnp.asarray(data["audio"]))}

    @property
    def embed_fn(self):
        return lambda params, audio: _dummy_embed(audio)
