"""Embedder registry.

Mirror of reference src/audio_metrics/embedders/__init__.py:9-56: seven named
configurations (six CLAP variants across two checkpoints x three tap layers,
plus VGGish).  Model classes are imported lazily so that the metrics core has
no model dependencies.
"""

from __future__ import annotations

from .base import Embedder
from .dummy import DummyEmbedder

__all__ = ["Embedder", "DummyEmbedder", "EMBEDDERS", "DEFAULT_EMBEDDER", "get_embedder"]


def _clap(**kwargs):
    from .clap import LaionCLAP

    return LaionCLAP(**kwargs)


def _vggish(**kwargs):
    from .vggish import VGGish

    return VGGish(**kwargs)


def _clap_kwargs(music: bool, layer: str | None) -> dict:
    from .clap import (
        LAION_CLAP_MUSIC_CHECKPOINT_URL,
        LAION_CLAP_MUSIC_SPEECH_CHECKPOINT_URL,
    )

    ckpt = (
        LAION_CLAP_MUSIC_CHECKPOINT_URL
        if music
        else LAION_CLAP_MUSIC_SPEECH_CHECKPOINT_URL
    )
    kwargs = {"ckpt": ckpt}
    if layer is not None:
        kwargs["layer"] = layer
    return kwargs


EMBEDDERS = {
    "laion_clap_music": (_clap, lambda: _clap_kwargs(True, None)),
    "laion_clap_music_l-2": (_clap, lambda: _clap_kwargs(True, "audio_projection.0")),
    "laion_clap_music_l-1": (_clap, lambda: _clap_kwargs(True, "audio_projection.2")),
    "laion_clap_music_speech": (_clap, lambda: _clap_kwargs(False, None)),
    "laion_clap_music_speech_l-2": (
        _clap,
        lambda: _clap_kwargs(False, "audio_projection.0"),
    ),
    "laion_clap_music_speech_l-1": (
        _clap,
        lambda: _clap_kwargs(False, "audio_projection.2"),
    ),
    "vggish": (_vggish, dict),
    "dummy": (DummyEmbedder, dict),
}

DEFAULT_EMBEDDER = "laion_clap_music"


def get_embedder(name: str | None = None) -> Embedder:
    if name is None:
        name = DEFAULT_EMBEDDER
    info = EMBEDDERS.get(name)
    if info is None:
        raise ValueError(
            f"Unknown embedder {name}, must be one of {list(EMBEDDERS.keys())}"
        )
    factory, kwargs_factory = info
    return factory(**kwargs_factory())
