"""audio-metrics-tpu: TPU-native distribution-based audio quality metrics.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SonyCSLParis/audio-metrics: Frechet Audio Distance, Kernel Distance,
Precision/Recall/Density/Coverage and Accompaniment Prompt Adherence over
embedding distributions of audio clip sets, with the audio frontend, the
embedding models and the metric math all running on TPU.

Public API mirrors the reference (src/audio_metrics/__init__.py:8):

    from audio_metrics_tpu import AudioMetrics
"""

import os

__version__ = "0.9.0"

# Double precision is required for distribution statistics (the reference
# accumulates mean/covariance in torch.float64, data.py:27) and for the f64
# reductions in the KD estimator.  All model / DSP code in this package pins
# its dtypes explicitly (float32 / bfloat16), so enabling x64 does not slow
# the compute path.  Opt out with AM_TPU_NO_X64=1 before importing.
if not os.environ.get("AM_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the CLAP forward takes tens of seconds
# to compile per process; a disk cache amortizes it across runs.  Set
# AM_TPU_COMPILE_CACHE to a directory (or "1" for the default location).
_cache = os.environ.get("AM_TPU_COMPILE_CACHE")
if _cache:
    import jax

    if _cache == "1":
        _cache = os.path.join(
            os.path.expanduser("~"), ".cache", "audio_metrics_tpu", "xla_cache"
        )
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .audio_metrics import AudioMetrics  # noqa: E402
from .data import AudioMetricsData  # noqa: E402

__all__ = ["AudioMetrics", "AudioMetricsData", "__version__"]
