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

__all__ = ["Embedder"]


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
