"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; the test
suite validates numerics and sharding on the CPU backend with
``--xla_force_host_platform_device_count=8`` so multi-chip code paths compile
and execute without TPU hardware (SURVEY.md §4).

Note: the environment may preimport jax (sitecustomize) with a TPU platform
selected, so setting JAX_PLATFORMS via os.environ here can be too late —
override the live jax config instead, before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert not any(
    m.startswith("audio_metrics_tpu") for m in sys.modules
), "conftest must configure jax before the package is imported"
