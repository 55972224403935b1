"""Streaming statistics accumulator for embedding distributions.

TPU-native counterpart of the reference's ``AudioMetricsData``
(reference: src/audio_metrics/data.py:18-113).  Design differences:

- Statistics (mean / covariance) are kept on host in numpy float64, exactly
  like the reference keeps torch.float64 tensors.  The *heavy* work (computing
  per-batch moments from thousands of embeddings) happens on device in float32
  via :func:`batch_moments`, which returns raw moments ``(n, sum_x, sum_xxT)``.
  Raw moments are associative, so they can be merged across batches, across
  hosts, and across chips with ``jax.lax.psum`` — this is what makes the
  accumulator mesh-shardable (reference has no equivalent; it merges
  per-batch (mean, cov) pairs with a Chan update, data.py:77-94).
- Embeddings are stored as a list of chunks and concatenated lazily, avoiding
  the reference's O(N^2) repeated ``torch.cat`` (data.py:68-72).
- ``recompute_stats`` with n == 1 produces a (d, d) zero covariance; the
  reference inconsistently produces (1, 1) there (data.py:56) — a known quirk
  we deliberately do not reproduce.
"""

from __future__ import annotations

import threading as _threading

import numpy as np

__all__ = ["AudioMetricsData", "ensure_ndarray", "batch_moments"]


def ensure_ndarray(x) -> np.ndarray:
    """Convert array-likes (numpy, jax, torch) to a numpy ndarray.

    Counterpart of reference data.py:12-15, extended to JAX arrays.
    """
    if isinstance(x, np.ndarray):
        return x
    # torch tensors expose .detach/.cpu; jax arrays support np.asarray directly
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "cpu"):
        x = x.cpu()
    return np.asarray(x)


def batch_moments(embeddings, mask=None):
    """Batch moments: ``(n, sum_x, sum (x-mu)(x-mu)^T over masked rows)``.

    Pure jnp function; jit/pjit-friendly.  ``mask`` (float or bool, shape
    [batch]) selects valid rows, enabling fixed-shape padded batches and
    per-category routing on device.  The second moment is *centered* at the
    batch mean: a raw ``x^T x`` in float32 cancels catastrophically against
    ``n mu mu^T`` when |mean| >> std, while the centered form stays accurate.
    Centering uses the globally-reduced mean, so under GSPMD the whole
    computation still shards over the batch axis — this replaces the
    reference's host-side per-category ``AudioMetricsData.add`` loop
    (embed.py:226-236).
    """
    import jax.numpy as jnp

    e = jnp.asarray(embeddings, dtype=jnp.float32)
    if mask is None:
        n = jnp.asarray(e.shape[0], dtype=jnp.float32)
        s1 = jnp.sum(e, axis=0)
        mean = s1 / jnp.maximum(n, 1.0)
        c = e - mean
        m2 = jnp.dot(c.T, c, preferred_element_type=jnp.float32)
    else:
        m = jnp.asarray(mask, dtype=jnp.float32)
        n = jnp.sum(m)
        s1 = jnp.sum(e * m[:, None], axis=0)
        mean = s1 / jnp.maximum(n, 1.0)
        c = (e - mean) * m[:, None]
        m2 = jnp.dot(c.T, c, preferred_element_type=jnp.float32)
    return n, s1, m2


def _batch_moments_jit(e):
    """Module-level cached jit of batch_moments (per-call jax.jit wrappers
    retrace every call)."""
    global _BATCH_MOMENTS_JIT
    try:
        fn = _BATCH_MOMENTS_JIT
    except NameError:
        import jax

        fn = _BATCH_MOMENTS_JIT = jax.jit(batch_moments)
    return fn(e)


def _packable_dim(m2) -> int | None:
    """Return d when ``m2`` is a device-resident square (d, d) array large
    enough that pulling only its lower triangle beats the extra device
    dispatch (remote-device links are per-byte: the (512, 512) f32 moment is
    ~1 MB = ~37 ms through the 27 MB/s dev relay; packed it is ~19 ms)."""
    import os

    if os.environ.get("AM_TPU_NO_PACKED_PULL"):
        return None
    if isinstance(m2, np.ndarray) or getattr(m2, "ndim", 0) != 2:
        return None
    d = m2.shape[0]
    if m2.shape[1] != d or d < 128:
        return None
    return d


def _pack_tril_jit(m2):
    """Device-side lower-triangle pack of a symmetric (d, d) moment.

    One cached jit (retraces per shape).  ``m2 = c^T c`` is symmetric by
    construction; the MXU computes (i, j) and (j, i) with the same reduction
    order, so mirroring the packed triangle on host reproduces the full
    matrix bitwise (pinned by tests/test_data.py::test_packed_pull_parity).
    """
    global _PACK_TRIL
    try:
        fn = _PACK_TRIL
    except NameError:
        import jax
        import jax.numpy as jnp

        def _pack(m):
            il = np.tril_indices(m.shape[0])
            return m[il]

        fn = _PACK_TRIL = jax.jit(_pack)
    return fn(m2)


def _unpack_tril_host(packed: np.ndarray, d: int) -> np.ndarray:
    out = np.empty((d, d), dtype=packed.dtype)
    il = np.tril_indices(d)
    out[il] = packed
    out.T[il] = packed  # mirror into the upper triangle (diag rewritten equal)
    return out


def _pull_moment_pairs(pending) -> list:
    """device_get a pending list of ``(n, s1, m2)`` triples as host
    ``(s1, m2)`` pairs, pulling each symmetric m2 as its packed lower
    triangle (halves the dominant transfer; see :func:`_packable_dim`)."""
    import jax

    shaped = []
    for (_, s1, m2) in pending:
        d = _packable_dim(m2)
        shaped.append((d, s1, _pack_tril_jit(m2) if d else m2))
    host = jax.device_get([(s1, m2) for (_, s1, m2) in shaped])
    return [
        (s1_h, _unpack_tril_host(m2_h, d) if d else m2_h)
        for (d, _, _), (s1_h, m2_h) in zip(shaped, host)
    ]


def flush_pending_stats(amds, extra=None):
    """Materialize pending device moments of several accumulators with ONE
    coalesced device->host transfer (each pull is a full round trip on
    remote-device links; APA evaluates produce two categories per run).

    ``extra``: optional pytree of device arrays to pull in the SAME
    transfer (e.g. the FAD device-tail outputs — metrics/fad.py); its host
    values are returned."""
    amds = [a for a in amds if a is not None and a._pending]
    if not amds and extra is None:
        return None
    taken = []
    flat = []
    for a in amds:
        with a._pending_lock:
            pending, a._pending = a._pending, []
            a._pending_n = 0
        taken.append((a, pending))
        flat.extend(pending)
    shaped = []
    for (_, s1, m2) in flat:
        d = _packable_dim(m2)
        shaped.append((d, s1, _pack_tril_jit(m2) if d else m2))
    import jax

    moments, extra_host = jax.device_get(
        ([(s1, m2) for (_, s1, m2) in shaped], extra)
    )
    host = [
        (s1_h, _unpack_tril_host(m2_h, d) if d else m2_h)
        for (d, _, _), (s1_h, m2_h) in zip(shaped, moments)
    ]
    i = 0
    for a, pending in taken:
        for (n, _, _) in pending:
            s1_h, m2_h = host[i]
            i += 1
            a._merge_moments_host(n, s1_h, m2_h)
    return extra_host


class AudioMetricsData:
    """Streaming mean / covariance (+ optional raw embeddings) per category.

    API mirror of reference data.py:18-113: ``add``, ``__iadd__``, ``__add__``,
    ``__len__``, ``get_radii``, ``recompute_stats``, ``serialize`` /
    ``deserialize``.
    """

    def __init__(self, store_embeddings: bool = True):
        self._mean: np.ndarray | None = None
        self._n: int | None = None
        self._cov: np.ndarray | None = None
        self.store_embeddings = bool(store_embeddings)
        self._embedding_chunks: list[np.ndarray] = []
        self._embeddings_cat: np.ndarray | None = None
        self.radii: dict[str, np.ndarray] = {}
        self.dtype = np.float64
        # device-resident moment triples not yet merged into the host f64
        # stats (see add_moments_device); guarded by a lock because the
        # evaluate() tail flushes from the FAD worker thread
        self._pending: list[tuple[int, object, object]] = []
        self._pending_n = 0
        self._pending_lock = _threading.Lock()

    # ------------------------------------------------------------------
    # stats access (lazy: pending device moments merge on first read)
    # ------------------------------------------------------------------
    @property
    def mean(self) -> np.ndarray | None:
        self._flush_pending()
        return self._mean

    @mean.setter
    def mean(self, value) -> None:
        self._mean = value

    @property
    def cov(self) -> np.ndarray | None:
        self._flush_pending()
        return self._cov

    @cov.setter
    def cov(self, value) -> None:
        self._cov = value

    @property
    def n(self) -> int | None:
        """Total accumulated count — known WITHOUT flushing pending device
        moments (the pipeline knows batch counts host-side), so ``len()``
        and PRDC's adaptive k never force a device sync."""
        if self._n is None and not self._pending:
            return None
        return (self._n or 0) + self._pending_n

    @n.setter
    def n(self, value) -> None:
        self._n = value

    def _flush_pending(self) -> None:
        """Merge pending device moment triples into the host f64 stats.

        ONE coalesced device->host pull for all pending triples, merged in
        arrival order (bitwise-identical to having merged eagerly)."""
        if not self._pending:
            return
        with self._pending_lock:
            pending, self._pending = self._pending, []
            self._pending_n = 0
            if not pending:
                return
            host = _pull_moment_pairs(pending)
            for (n, _, _), (s1_h, m2_h) in zip(pending, host):
                self._merge_moments_host(n, s1_h, m2_h)

    # ------------------------------------------------------------------
    # accumulation
    # ------------------------------------------------------------------
    def add(self, embeddings) -> None:
        """Accumulate a batch of embeddings (host API, reference data.py:37-47)."""
        self._flush_pending()  # keep the Chan-merge order == arrival order
        e = ensure_ndarray(embeddings)
        if e.ndim != 2:
            raise ValueError(f"embeddings must be 2-D, got shape {e.shape}")
        n = len(e)
        if n == 0:
            return
        ef = e.astype(np.float64)
        mean = ef.mean(axis=0)
        if n == 1:
            d = e.shape[-1]
            cov = np.zeros((d, d), dtype=self.dtype)
        else:
            centered = ef - mean
            cov = centered.T @ centered / (n - 1)
        self._update_stats(mean, cov, n)
        if self.store_embeddings:
            self._embedding_chunks.append(np.array(e, dtype=np.float32, copy=True))
            self._embeddings_cat = None
            self._embeddings_dev = None

    def add_moments(self, n, s1, m2, embeddings=None) -> None:
        """Accumulate device-computed moments (see :func:`batch_moments`).

        ``m2`` is the mean-centered second-moment sum; ``cov = m2 / (n-1)``.
        ``embeddings`` (optional) are the corresponding valid rows, stored when
        ``store_embeddings`` is set.  This is the fast path used by the
        embedding pipeline: device returns float32 moments, host merges f64.
        """
        self._flush_pending()
        n = int(round(float(n)))
        if n <= 0:
            return
        self._merge_moments_host(
            n, ensure_ndarray(s1), ensure_ndarray(m2)
        )
        if self.store_embeddings and embeddings is not None:
            e = ensure_ndarray(embeddings)
            self._embedding_chunks.append(np.array(e, dtype=np.float32, copy=True))
            self._embeddings_cat = None
            self._embeddings_dev = None

    def add_moments_device(self, n: int, s1, m2) -> None:
        """Like :meth:`add_moments`, but WITHOUT the device->host sync.

        ``n`` must be a host-side count (the pipeline knows its valid-row
        counts without asking the device); ``s1``/``m2`` may be in-flight
        device arrays.  They are merged — in arrival order, so the result is
        bitwise-identical to the eager path — on the first stats *read*
        (``mean`` / ``cov`` / serialization), letting the evaluate() tail
        overlap this pull with the KD/PRDC device sweeps instead of stalling
        the pipeline on a (d, d) transfer the metrics don't need yet."""
        n = int(round(float(n)))
        if n <= 0:
            return
        with self._pending_lock:
            self._pending.append((n, s1, m2))
            self._pending_n += n

    def _merge_moments_host(self, n: int, s1, m2) -> None:
        s1 = np.asarray(s1).astype(np.float64)
        m2 = np.asarray(m2).astype(np.float64)
        mean = s1 / n
        if n == 1:
            cov = np.zeros((s1.shape[0], s1.shape[0]), dtype=self.dtype)
        else:
            cov = m2 / (n - 1)
        self._update_stats(mean, cov, n)

    def _update_stats(self, mean: np.ndarray, cov: np.ndarray, n: int) -> None:
        """Chan merge of (mean, cov, n) pairs (reference data.py:77-94).

        Operates on the raw (already-flushed) host stats — callers are the
        flush itself and the eager accumulation paths, which flush first."""
        if self._n is None:
            self._mean = mean.astype(self.dtype)
            self._cov = cov.astype(self.dtype)
            self._n = n
            return
        n_prod = self._n * n
        n_total = self._n + n
        new_mean = (self._n * self._mean + n * mean) / n_total
        diff = self._mean - mean
        w_self = (self._n - 1) / (n_total - 1)
        w_other = (n - 1) / (n_total - 1)
        w_diff = (n_prod / n_total) / (n_total - 1)
        self._cov = w_self * self._cov + w_other * cov + w_diff * np.outer(diff, diff)
        self._mean = new_mean
        self._n = n_total

    # ------------------------------------------------------------------
    # embeddings access
    # ------------------------------------------------------------------
    @property
    def has_embeddings(self) -> bool:
        """Existence check WITHOUT materializing (``.embeddings is not None``
        would pull every device chunk to host just to answer a boolean)."""
        return bool(self._embedding_chunks)

    @property
    def embeddings(self) -> np.ndarray | None:
        """Host (numpy) view of the stored embeddings.

        Chunks may be numpy or device-resident jax arrays (the embedding
        pipeline stores device chunks so nothing round-trips the
        host<->device link); the device->host pull happens here, only when a
        host consumer (serialization, PCA fit, user access) actually asks.
        """
        if not self._embedding_chunks:
            return None
        if self._embeddings_cat is None:
            if any(not isinstance(c, np.ndarray) for c in self._embedding_chunks):
                import jax

                # concat on device, pull ONCE (per-chunk pulls are serial
                # sync round-trips on remote-device links)
                self._embeddings_cat = np.asarray(
                    jax.device_get(self.embeddings_device), dtype=np.float32
                )
            elif len(self._embedding_chunks) == 1:
                self._embeddings_cat = np.asarray(
                    self._embedding_chunks[0], dtype=np.float32
                )
            else:
                self._embeddings_cat = np.concatenate(self._embedding_chunks, axis=0)
        return self._embeddings_cat

    @property
    def embeddings_device(self):
        """Device-resident concatenation of the stored embeddings, cached so
        the KD/PRDC kernels share one copy.  Device chunks concatenate on
        device — no host round-trip."""
        if not self._embedding_chunks:
            return None
        if getattr(self, "_embeddings_dev", None) is None:
            import jax.numpy as jnp

            if self._embeddings_cat is not None:
                self._embeddings_dev = jnp.asarray(self._embeddings_cat)
            elif len(self._embedding_chunks) == 1:
                self._embeddings_dev = jnp.asarray(self._embedding_chunks[0])
            else:
                self._embeddings_dev = jnp.concatenate(
                    [jnp.asarray(c) for c in self._embedding_chunks], axis=0
                )
        return self._embeddings_dev

    @embeddings.setter
    def embeddings(self, value) -> None:
        if value is None:
            self._embedding_chunks = []
        else:
            self._embedding_chunks = [ensure_ndarray(value).astype(np.float32)]
        self._embeddings_cat = None
        self._embeddings_dev = None

    def recompute_stats(self) -> None:
        """Recompute exact stats from stored embeddings (reference data.py:49-58).

        When the chunks are device-resident, the O(N d^2) moment reduction
        runs on device (centered f32 moments, f64 finals) and only (d,)+(d,d)
        leave the chip — pulling N x d embeddings through the host link just
        to re-reduce them would dominate the pipeline on slow interconnects.
        """
        if not self._embedding_chunks:
            return
        # stats are recomputed from the stored chunks wholesale; pending
        # device moments describe rows already in those chunks
        with self._pending_lock:
            self._pending = []
            self._pending_n = 0
        if self._embeddings_cat is None and not any(
            isinstance(c, np.ndarray) for c in self._embedding_chunks
        ):
            e = self.embeddings_device
            n, s1, m2 = _batch_moments_jit(e)
            self.n = int(e.shape[0])
            ((s1_h, m2_h),) = _pull_moment_pairs([(None, s1, m2)])
            self.mean = np.asarray(s1_h).astype(self.dtype) / self.n
            if self.n == 1:
                d = int(e.shape[-1])
                self.cov = np.zeros((d, d), dtype=self.dtype)
            else:
                self.cov = np.asarray(m2_h).astype(self.dtype) / (self.n - 1)
            return
        e = self.embeddings
        self.n = len(e)
        ef = e.astype(np.float64)
        self.mean = ef.mean(axis=0)
        if self.n == 1:
            d = e.shape[-1]
            self.cov = np.zeros((d, d), dtype=self.dtype)
        else:
            centered = ef - self.mean
            self.cov = centered.T @ centered / (self.n - 1)

    def chol_cov(self) -> np.ndarray | None:
        """Cholesky factor of ``cov``, cached by array identity.

        FAD's trace-sqrtm runs its similarity transform on the reference
        side precisely so this factorization (~8 ms at d=512) is paid once
        per reference, not once per evaluate.  Every stats update rebinds
        ``self.cov`` to a fresh array (nothing mutates it in place), so
        caching on the array object itself is a safe invalidation rule.
        Returns None when ``cov`` is absent or numerically semidefinite
        (callers fall back to the eigh route)."""
        cov = self.cov
        if cov is None:
            return None
        cached = getattr(self, "_chol_cache", None)
        if cached is not None and cached[0] is cov:
            return cached[1]
        try:
            l = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
        except np.linalg.LinAlgError:
            l = None
        self._chol_cache = (cov, l)
        return l

    def get_radii(self, k_neighbor: int) -> np.ndarray | None:
        """k-NN radii of the stored embeddings, cached per k (data.py:60-66)."""
        key = f"radii_{k_neighbor}"
        radii = self.radii.get(key)
        if radii is None and self.has_embeddings:
            from .metrics.prdc import nearest_neighbour_distances

            radii = ensure_ndarray(
                nearest_neighbour_distances(self.embeddings_device, k_neighbor)
            )
            self.radii[key] = radii
        return radii

    # ------------------------------------------------------------------
    # merge / len
    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.n or 0

    def __iadd__(self, other: "AudioMetricsData") -> "AudioMetricsData":
        assert isinstance(other, AudioMetricsData)
        if other.n is None:
            return self
        if self.n is None:
            self.store_embeddings = other.store_embeddings
        assert self.store_embeddings == other.store_embeddings
        self._flush_pending()  # merge order == arrival order
        # property reads flush `other`'s pending device moments
        self._update_stats(other.mean, other.cov, other.n)
        if self.store_embeddings and other._embedding_chunks:
            # adopt chunks as-is: device chunks stay on device
            self._embedding_chunks.extend(other._embedding_chunks)
            self._embeddings_cat = None
            self._embeddings_dev = None
        return self

    def __add__(self, other: "AudioMetricsData") -> "AudioMetricsData":
        new = AudioMetricsData()
        new += self
        new += other
        return new

    # ------------------------------------------------------------------
    # serialization (numpy-native; reference uses torch.save, data.py:28-35)
    # ------------------------------------------------------------------
    def serialize(self) -> dict:
        return {
            "mean": None if self.mean is None else np.asarray(self.mean),
            "cov": None if self.cov is None else np.asarray(self.cov),
            "n": self.n,
            "store_embeddings": self.store_embeddings,
            "embeddings": self.embeddings,
            # radii may be device-resident (the fused PRDC path caches them
            # without a host sync) — coerce for the .npz writer
            "radii": {k: np.asarray(v) for k, v in self.radii.items()},
        }

    @classmethod
    def deserialize(cls, state: dict) -> "AudioMetricsData":
        self = cls(store_embeddings=state.get("store_embeddings", True))
        self.mean = state.get("mean")
        self.cov = state.get("cov")
        n = state.get("n")
        self.n = None if n is None else int(n)
        emb = state.get("embeddings")
        if emb is not None:
            self._embedding_chunks = [np.asarray(emb, dtype=np.float32)]
        self.radii = dict(state.get("radii") or {})
        return self
