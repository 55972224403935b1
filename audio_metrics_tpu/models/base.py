"""Embedder protocol.

The reference defines an informal protocol — ``.sr``, ``.get_device()``,
``.forward(data) -> {"embedding": tensor}`` (clap.py:21-44, vggish.py:14-33,
tests/test_audio_metrics.py:7-24).  Here the contract is:

- ``sr`` (int): the sample rate the embedder expects.
- ``forward(data: dict) -> dict``: ``data["audio"]`` is a float32 array of
  shape (batch, n_samples); the result maps output names to (batch, d)
  embedding arrays and must contain ``"embedding"``.

``forward`` should be backed by a jitted function so the pipeline's calls
compile once per batch shape.  There is no ``get_device()`` — device placement
is the mesh's job, not the model's.
"""

from __future__ import annotations

import logging
import os

__all__ = ["Embedder"]

logger = logging.getLogger(__name__)


def _require_random_weights_optin(name: str, ckpt, allowed: bool) -> None:
    """Raise unless random weights were explicitly opted into.

    Metric values from randomly initialized embedders are meaningless; the
    reference's behavior is download-or-die (embedders/clap.py:17-18,
    vggish.py:7-13).  Benchmarks and pipeline tests that only need the FLOPs
    pass ``allow_random_weights=True`` or set AM_TPU_ALLOW_RANDOM_WEIGHTS=1.
    """
    if allowed or os.environ.get("AM_TPU_ALLOW_RANDOM_WEIGHTS"):
        logger.warning(
            "%s: no checkpoint available; using seeded random weights "
            "(benchmark-valid FLOPs, NOT metric-valid values)", name
        )
        return
    raise RuntimeError(
        f"{name}: checkpoint unavailable"
        + (f" ({ckpt})" if ckpt else " (no ckpt specified)")
        + ". Provide a local path via ckpt=/path/to/file, provision the file "
        "under $AM_TPU_CKPT_DIR or the download cache (utils/get_url.py), or "
        "pass allow_random_weights=True / set AM_TPU_ALLOW_RANDOM_WEIGHTS=1 "
        "to run with seeded random weights (benchmarking only — metric "
        "values from random weights are meaningless)."
    )


class Embedder:
    sr: int = 48000

    def forward(self, data: dict) -> dict:
        raise NotImplementedError

    @property
    def embed_fn(self):
        """Optional pure function ``(params, (batch, n_samples)) -> (batch,
        d)`` that is traceable under jit (no host logic).  When an embedder
        provides it, the pipeline's device-resident path fuses the whole
        batch loop — slicing, forward, moment accumulation, embedding store —
        into ONE jitted program (one dispatch per eval set instead of several
        per batch; dispatch latency dominates on remote-device links).
        ``params`` is the embedder's ``.params`` pytree, passed as a jit
        ARGUMENT (closure-captured weights would bake into the HLO as
        constants).  Return None when the forward needs host-side handling."""
        return None

    def __call__(self, data: dict) -> dict:
        return self.forward(data)

    def shard(self, mesh) -> None:
        """Replicate parameters over a mesh (SPMD data parallelism).

        The TPU equivalent of the reference's per-GPU model replica cache
        (gpu_parallel.py:50-57): with a mesh, replication is a one-time
        ``device_put`` with a fully-replicated NamedSharding; the jitted
        forward then runs SPMD with batch-sharded inputs.
        """
        params = getattr(self, "params", None)
        if params is None:
            return
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
        self.params = jax.device_put(params, sharding)
