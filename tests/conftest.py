"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; the test
suite validates numerics and sharding on the CPU backend with
``--xla_force_host_platform_device_count=8`` so multi-chip code paths compile
and execute without TPU hardware (SURVEY.md §4).

``AM_TPU_TEST_REAL=1`` keeps the default (TPU) backend instead — the
nightly/real-hardware mode for the Pallas kernel suites, e.g.:

    AM_TPU_TEST_REAL=1 python -m pytest \
        tests/test_pallas_distance.py tests/test_pallas_model_kernels.py -q

(kernels then run compiled on the chip; interpret=True calls still
interpret, so the parity oracles remain the comparison).  Mesh-dependent
tests skip themselves when fewer than 8 devices are present.

Note: the environment may preimport jax (sitecustomize) with a TPU platform
selected, so setting JAX_PLATFORMS via os.environ here can be too late —
override the live jax config instead, before any backend is initialized.
"""

import os
import sys

if os.environ.get("AM_TPU_TEST_REAL"):
    # Parity tolerances are calibrated against f32-accurate oracles; on TPU
    # the default matmul precision routes f32 through the bf16 MXU passes,
    # which would fail the oracle, not the kernel under test.
    import jax  # noqa: E402

    jax.config.update("jax_default_matmul_precision", "highest")
else:
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
