from .windowing import audio_slicer, multi_audio_slicer, window_length

__all__ = ["audio_slicer", "multi_audio_slicer", "window_length"]
