"""The embedding pipeline: host streaming frontend + jitted device stages.

TPU-native counterpart of reference src/audio_metrics/embed.py:93-237.  The
reference chains generators through thread pools (cpu_parallel) and a
free-GPU queue (gpu_parallel), because its DSP is per-item CPU code and its
models are replicated CUDA modules.  Here the design is inverted:

- The host side is a *thin* feeder: ingest, shuffle (APA), window slicing,
  misaligned-pair construction, and fixed-shape batch assembly with padding
  masks.  These are O(1)-per-item index operations.
- Everything per-sample runs on device under jit with static shapes:
  resampling (polyphase conv), mixing (batched loudness pipeline), the
  embedder forward, and the statistics reduction (masked raw moments).
  One compiled program per (bucket-kind, batch-shape); batches are padded to
  a fixed size so each bucket compiles exactly once.
- Windows are cut at the *input* rate and resampled on device as a batch
  (the reference resamples whole songs on 64 CPU threads first,
  embed.py:161-169 — same result, but dynamic shapes would defeat XLA).
- Category routing (aligned / misaligned / stem; embed.py:226-236) happens on
  device via masks, so when raw embeddings are not needed only
  (n, sum_x, sum_xx^T) moments leave the chip.  The moments are associative,
  so the same program shards over a mesh with batch-axis sharding.
"""

from __future__ import annotations

import logging
import os
import random
import threading
from enum import IntEnum
from functools import partial
from itertools import tee

import numpy as np
import jax
import jax.numpy as jnp

from ..data import AudioMetricsData, batch_moments, ensure_ndarray
from ..ops.mix import emit_mix_diagnostics
from ..ops.windowing import multi_audio_slicer, window_length
from .shuffle import shuffle_stream

__all__ = ["ItemCategory", "embedding_pipeline", "serialize_items", "batch_accumulator"]

logger = logging.getLogger(__name__)


class ItemCategory(IntEnum):
    """Window categories (reference embed.py:18-21)."""

    aligned = 1
    misaligned = 2
    stem = 3


# ----------------------------------------------------------------------
# host-side stream stages
# ----------------------------------------------------------------------
def serialize_items(items1, items2=None, apa_mode=False, stems_mode=False):
    """Expand windows into categorized items (reference embed.py:44-66).

    Each (paired) window yields up to three items: the aligned pair, the
    misaligned pair (context of item1 + stem of the shuffled item2), and the
    mono stem channel.
    """
    if items2 is None:
        item_pairs = ((item, None) for item in items1)
    else:
        item_pairs = zip(items1, items2)

    msg = (
        "When computing APA items should be tensors/arrays of shape "
        "[n_samples, 2] (pairing context and stem)"
    )
    for item1, item2 in item_pairs:
        item1 = ensure_ndarray(item1)
        if apa_mode:
            if item1.ndim != 2:
                raise ValueError(msg)
            yield {"audio": item1, "category": ItemCategory.aligned}
            if item2 is not None:
                item2 = ensure_ndarray(item2)
                if item2.ndim != 2:
                    raise ValueError(msg)
                misaligned = np.column_stack((item1[:, 0], item2[:, 1]))
                yield {"audio": misaligned, "category": ItemCategory.misaligned}
        if stems_mode:
            stem = item1[:, -1] if item1.ndim == 2 else item1
            yield {"audio": stem, "category": ItemCategory.stem}


def mix_pair(data, mix_func, sr):
    """Per-item mix helper (reference embed.py:86-90 parity): stems pass
    through; context+stem pairs are mixed to mono."""
    if data["category"] == ItemCategory.stem:
        return {"audio": data["audio"]}
    return {"audio": ensure_ndarray(mix_func(data["audio"], sr=sr))}


def batch_accumulator(items, batch_size=32):
    """Simple stacking batcher (reference embed.py:24-41); kept for API parity.

    The pipeline itself uses the bucketed, padded batcher below.
    """
    audio, category = [], []
    for item in items:
        audio.append(item["audio"])
        category.append(item["category"])
        if len(audio) == batch_size:
            yield {"audio": np.stack(audio), "category": np.array(category)}
            audio, category = [], []
    if audio:
        yield {"audio": np.stack(audio), "category": np.array(category)}


def _bucketed_batches(items, batch_size, pad_host=False):
    """Group categorized items into homogeneous fixed-size padded batches.

    Two buckets: stereo pairs (aligned/misaligned — need mixing) and mono
    stems (pass-through).  Homogeneous buckets mean each device program does
    no wasted work and compiles once.  Yields
    ``(kind, audio[n, ...], category[B], valid[B])`` with B == batch_size.

    A partial final batch keeps only its real audio rows unless ``pad_host``
    — the consumer pads to B rows ON DEVICE after upload, so the pad rows
    never cross the host link.  With batch_size 512 and a 128-clip host-fed
    set, host-side padding quadrupled the upload bytes, which is exactly the
    host-fed throughput collapse BENCH_r04.json recorded (17.8 -> 4.54
    clips/s through the ~27 MB/s relay).  The mesh-sharded path sets
    ``pad_host=True``: sharded uploads need the row count to tile over the
    mesh.
    """

    def flush(kind, audio_list, cat_list):
        n = len(audio_list)
        audio = np.stack(audio_list).astype(np.float32, copy=False)
        if pad_host and n < batch_size:
            pad = np.zeros((batch_size - n,) + audio.shape[1:], dtype=np.float32)
            audio = np.concatenate([audio, pad], axis=0)
        category = np.zeros(batch_size, dtype=np.int32)
        category[:n] = cat_list
        valid = np.zeros(batch_size, dtype=bool)
        valid[:n] = True
        return kind, audio, category, valid

    buckets = {"pair": ([], []), "mono": ([], [])}
    for item in items:
        kind = "mono" if item["category"] == ItemCategory.stem else "pair"
        audio_list, cat_list = buckets[kind]
        audio_list.append(item["audio"])
        cat_list.append(int(item["category"]))
        if len(audio_list) == batch_size:
            yield flush(kind, audio_list, cat_list)
            buckets[kind] = ([], [])
    for kind, (audio_list, cat_list) in buckets.items():
        if audio_list:
            yield flush(kind, audio_list, cat_list)


def _native_batches(
    waveforms, batch_size, win_len, apa_mode, stems_mode, seed, song_buffer,
    win_buffer, win_min_age
):
    """Batches from the C++ loader: a feeder thread streams songs in (the
    ctypes call releases the GIL and blocks on the loader's backpressure)
    while the caller consumes ready batches."""
    from .native_loader import NativeBatcher

    nb = NativeBatcher(
        batch_size=batch_size,
        win_len=win_len,
        apa_mode=apa_mode,
        stems_mode=stems_mode,
        song_buffer=song_buffer,
        win_buffer=win_buffer,
        win_min_age=win_min_age,
        seed=seed if seed is not None else random.getrandbits(63),
    )
    errors = []

    def feeder():
        try:
            for song in waveforms:
                nb.feed(ensure_ndarray(song))
        except Exception as exc:  # surfaced after iteration
            errors.append(exc)
        finally:
            nb.finish()

    thread = threading.Thread(target=feeder, daemon=True)
    thread.start()
    try:
        yield from nb
        thread.join()
    finally:
        # Abandoned mid-iteration (consumer break/exception/GC): unblock the
        # feeder's backpressure wait and join it BEFORE the batcher is
        # dropped — destroying the native loader while the feeder sits in
        # feed() is a use-after-free.
        nb.cancel()
        thread.join(timeout=30)
        if thread.is_alive():
            # cancel() only unblocks waits inside the native layer; a feeder
            # stuck in the *user's* waveform iterator cannot be interrupted.
            # The daemon thread (and the batcher its closure pins) leaks —
            # make that visible instead of silent.
            logger.warning(
                "native-loader feeder thread did not exit within 30s after "
                "cancel(); the source iterator appears blocked — the thread "
                "is abandoned as a daemon"
            )
    if errors:
        raise errors[0]


@partial(jax.jit, static_argnames=("size",))
def _slice_batch_jit(windows, start, size: int):
    return jax.lax.dynamic_slice_in_dim(windows, start, size, axis=0)


def _get_fused_embed_loop(embedder, batch_size: int):
    """ONE jitted program for an entire device-resident eval set: a
    lax.fori_loop over batches runs the embedder forward, accumulates the
    f64 Chan-merged moments in-carry, and writes embeddings into a
    preallocated buffer.  One dispatch + one tiny host pull per set, vs
    several dispatches per batch — dispatch latency dominates the pipeline
    on remote-device links.  Cached per (embedder, batch_size); jit caches
    per windows shape."""
    cache = getattr(embedder, "_am_fused_loops", None)
    if cache is None:
        cache = embedder._am_fused_loops = {}
    loop = cache.get(batch_size)
    if loop is not None:
        return loop
    embed_fn = embedder.embed_fn

    @jax.jit
    def loop(params, windows_padded, n_valid):
        n_pad, win_len = windows_padded.shape
        n_batches = n_pad // batch_size
        out_shape = jax.eval_shape(
            lambda a: embed_fn(params, a),
            jax.ShapeDtypeStruct((batch_size, win_len), jnp.float32),
        )
        d = out_shape.shape[-1]

        def body(i, carry):
            buf, n_a, s1_a, m2_a = carry
            audio = jax.lax.dynamic_slice_in_dim(
                windows_padded, i * batch_size, batch_size, axis=0
            )
            emb = embed_fn(params, audio).astype(jnp.float32)
            mask = (
                i * batch_size
                + jax.lax.broadcasted_iota(jnp.int32, (batch_size, 1), 0)[:, 0]
            ) < n_valid
            n, s1, m2 = batch_moments(emb, mask)
            # f32 Chan merge in-carry (emulated f64 elementwise is ~100x slow
            # on TPU for the (d, d) outer-product updates); the centered-M2
            # form keeps f32 accurate here, f64 finals happen on host
            n_t = n_a + n
            mean1 = s1_a / jnp.maximum(n_a, 1.0)
            mean2 = s1 / jnp.maximum(n, 1.0)
            dm = mean2 - mean1
            w = jnp.where(n_t > 0, n_a * n / jnp.maximum(n_t, 1.0), 0.0)
            m2_t = m2_a + m2 + w * jnp.outer(dm, dm)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, emb, i * batch_size, axis=0
            )
            return buf, n_t, s1_a + s1, m2_t

        init = (
            jnp.zeros((n_pad, d), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((d,), jnp.float32),
            jnp.zeros((d, d), jnp.float32),
        )
        return jax.lax.fori_loop(0, n_batches, body, init)

    cache[batch_size] = loop
    return loop


def _get_fused_embed_loop_sharded(embedder, batch_size: int, mesh):
    """Mesh-sharded variant of the fused embed loop (SPMD data parallelism).

    The window set is sharded on its leading axis; every chip runs the same
    local fori_loop over its shard (embedder forward + f32 Chan-merged
    moments in-carry, exactly as the single-chip loop), so the fast path —
    not just the streaming feeder — scales over the mesh.  Outputs:

    - the embedding buffer stays SHARDED (``P(axis)``) — downstream KD/PRDC
      consume device buffers and can keep them distributed;
    - per-chip moment triples come back with a per-chip leading axis; the
      cross-chip merge happens on host in f64 via the exact Chan update
      (``AudioMetricsData.add_moments`` per chip) — d×d per chip is tiny,
      and it avoids psum-ing centered M2 (which would need raw-moment form
      and reintroduce the f32 cancellation ``batch_moments`` exists to
      avoid).

    This replaces the reference's multi-GPU embedding backend
    (util/gpu_parallel.py:20-118) for device-resident inputs.
    """
    cache = getattr(embedder, "_am_fused_loops_sharded", None)
    if cache is None:
        cache = embedder._am_fused_loops_sharded = {}
    key = (batch_size, id(mesh))
    loop = cache.get(key)
    if loop is not None:
        return loop
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .mesh import batch_axes

    embed_fn = embedder.embed_fn
    axis = batch_axes(mesh)  # compound axis: every mesh axis (1-D or DCN 2-D)
    n_dev = mesh.size

    @jax.jit
    def loop(params, windows_padded, n_valid):
        n_pad, win_len = windows_padded.shape
        assert n_pad % (batch_size * n_dev) == 0
        out_shape = jax.eval_shape(
            lambda a: embed_fn(params, a),
            jax.ShapeDtypeStruct((batch_size, win_len), jnp.float32),
        )
        d = out_shape.shape[-1]

        def per_chip(params, w_local, n_valid):
            local_n = w_local.shape[0]
            base = jax.lax.axis_index(axis) * local_n

            def body(i, carry):
                buf, n_a, s1_a, m2_a = carry
                audio = jax.lax.dynamic_slice_in_dim(
                    w_local, i * batch_size, batch_size, axis=0
                )
                emb = embed_fn(params, audio).astype(jnp.float32)
                mask = (
                    base
                    + i * batch_size
                    + jax.lax.broadcasted_iota(jnp.int32, (batch_size, 1), 0)[:, 0]
                ) < n_valid
                n, s1, m2 = batch_moments(emb, mask)
                n_t = n_a + n
                mean1 = s1_a / jnp.maximum(n_a, 1.0)
                mean2 = s1 / jnp.maximum(n, 1.0)
                dm = mean2 - mean1
                w = jnp.where(n_t > 0, n_a * n / jnp.maximum(n_t, 1.0), 0.0)
                m2_t = m2_a + m2 + w * jnp.outer(dm, dm)
                buf = jax.lax.dynamic_update_slice_in_dim(
                    buf, emb, i * batch_size, axis=0
                )
                return buf, n_t, s1_a + s1, m2_t

            init = (
                jnp.zeros((local_n, d), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((d,), jnp.float32),
                jnp.zeros((d, d), jnp.float32),
            )
            # the carry becomes device-varying inside the body (the mask
            # depends on axis_index); mark the init to match
            init = jax.tree.map(lambda x: jax.lax.pcast(x, axis, to="varying"), init)
            buf, n_t, s1_t, m2_t = jax.lax.fori_loop(
                0, local_n // batch_size, body, init
            )
            # per-chip leading axis so out_specs P(axis) stacks the chips
            return buf, n_t[None], s1_t[None], m2_t[None]

        return shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )(params, windows_padded, n_valid)

    cache[key] = loop
    return loop


# n_valid device scalars, cached per value: each jnp.asarray of a host int
# is its own host->device transfer, a full round trip on remote-device
# relays, paid per add_reference/evaluate otherwise (the eval-set size
# repeats across calls by construction).
_N_VALID_CACHE: dict = {}


def _n_valid_dev(n: int):
    v = _N_VALID_CACHE.get(n)
    if v is None:
        if len(_N_VALID_CACHE) > 256:
            _N_VALID_CACHE.clear()
        v = _N_VALID_CACHE[n] = jnp.asarray(n, jnp.int32)
    return v


def _run_fused_embed(embedder, w, n, batch_size, mesh):
    """Dispatch the fused loop, sharded when a real mesh is present.

    ``w``: (N, win_len) device windows, ``n``: number of valid rows.
    Returns (buf, [(n, s1, m2), ...]) — one moment triple per chip.
    """
    sharded = mesh is not None and getattr(mesh, "size", 1) > 1
    if sharded:
        from .mesh import batch_sharding, replicated_sharding

        n_dev = mesh.size
        pad = (-w.shape[0]) % (batch_size * n_dev)
        if pad:
            w = jnp.pad(w, ((0, pad), (0, 0)))
        w = jax.device_put(w, batch_sharding(mesh))
        params = getattr(embedder, "params", {})
        params = jax.device_put(params, replicated_sharding(mesh))
        loop = _get_fused_embed_loop_sharded(embedder, batch_size, mesh)
        buf, nn, s1, m2 = loop(params, w, _n_valid_dev(int(n)))
        nn, s1, m2 = jax.device_get((nn, s1, m2))
        triples = [(nn[i], s1[i], m2[i]) for i in range(nn.shape[0])]
        return buf, triples
    params = getattr(embedder, "params", {})
    while True:
        pad = (-w.shape[0]) % batch_size
        wp = jnp.pad(w, ((0, pad), (0, 0))) if pad else w
        loop = _get_fused_embed_loop(embedder, batch_size)
        try:
            buf, nn, s1, m2 = loop(params, wp, _n_valid_dev(int(n)))
            break
        except Exception as exc:
            # HBM exhaustion surfaces synchronously at compile/enqueue (XLA
            # preallocates the program's output+temp buffers); halve the
            # batch and retry — the forward's working set scales with it,
            # the per-clip math does not.  Anything else re-raises, as does
            # exhaustion at a batch too small to plausibly be the cause.
            if "RESOURCE_EXHAUSTED" not in str(exc) or batch_size <= 64:
                raise
            batch_size //= 2
            logger.warning(
                "fused embed loop exhausted device memory; retrying at "
                "batch_size=%d",
                batch_size,
            )
    # NO host sync here: n is host-known (the loop's mask counts exactly the
    # first n rows) and s1/m2 stay in flight — AudioMetricsData merges them
    # lazily, so the (d, d) transfer overlaps the KD/PRDC device sweeps in
    # the evaluate() tail instead of stalling the pipeline.  The async copy
    # starts the (d,) transfer as soon as the loop finishes; m2 is NOT
    # pre-copied — the flush pulls it as a packed lower triangle
    # (data._pull_moment_pairs), so a full-matrix DMA here would be a
    # wasted second transfer on hosts whose DMA actually overlaps.
    try:
        s1.copy_to_host_async()
    except (AttributeError, RuntimeError):
        pass
    return buf, [(int(n), s1, m2)]


def _device_windows(waveforms, win_len: int, hop_len: int):
    """(N, n_samples) device array -> (N*k, win_len) windows on device,
    item-major order (matching multi_audio_slicer).  Returns None when the
    items are shorter than one window."""
    n = waveforms.shape[1]
    if n < win_len:
        return None
    k = (n - win_len) // hop_len + 1
    if n == win_len:
        return waveforms
    if hop_len == win_len:
        return waveforms[:, : k * win_len].reshape(-1, win_len)
    slices = [
        waveforms[:, i * hop_len : i * hop_len + win_len] for i in range(k)
    ]
    return jnp.stack(slices, axis=1).reshape(-1, win_len)


def _device_windows_pair(waveforms, win_len: int, hop_len: int):
    """(N, n_samples, 2) device array -> (N*k, win_len, 2) windows on
    device, item-major order (pair variant of _device_windows)."""
    n = waveforms.shape[1]
    if n < win_len:
        return None
    k = (n - win_len) // hop_len + 1
    if n == win_len:
        return waveforms
    if hop_len == win_len:
        return waveforms[:, : k * win_len].reshape(-1, win_len, 2)
    slices = [waveforms[:, i * hop_len : i * hop_len + win_len] for i in range(k)]
    return jnp.stack(slices, axis=1).reshape(-1, win_len, 2)


def _device_pair_eval(
    w,
    embedder,
    mix_function,
    sr: int,
    apa_mode,
    stems_mode: bool,
    batch_size: int,
    seed,
    store_mix: bool,
    store_stem: bool,
    mesh=None,
):
    """Device-resident APA path: (N*k, win, 2) pair windows -> per-category
    AudioMetricsData without any host round-trip.  Mixing runs in 64-pair
    chunks (bounds the loudness-meter intermediates) and each category's
    windows go through the same fused embed loop as the stems fast path.

    Deviation from the streaming feeders (documented in README): misaligned
    pairs come from a seeded uniform permutation of the stem windows rather
    than the reservoir/min-age shuffle — the anti-reference distribution is
    the same (stems paired with uniformly-random other windows); only the
    shuffle rng differs, which is already feeder-specific.
    """
    n_w = w.shape[0]

    def embed_set(mono, store):
        n = mono.shape[0]
        buf, triples = _run_fused_embed(embedder, mono, n, batch_size, mesh)
        amd = AudioMetricsData(store)
        for nn_h, s1_h, m2_h in triples:
            amd.add_moments_device(nn_h, s1_h, m2_h)
        if store:
            amd._embedding_chunks.append(buf[:n])
            amd._embeddings_cat = None
            amd._embeddings_dev = None
        return amd

    # Registry mixes stay on device in 64-pair chunks (bounds the loudness-
    # meter intermediates).  User-callable mixes (reference protocol
    # f(audio[n,2], sr) -> mono[n]) run on host inside _device_mix; use
    # smaller chunks there so each device->host pull stays well under the
    # large-transfer limits of remote-device links (CLAUDE.md).
    chunk = 64 if getattr(mix_function, "is_batched_mix", False) else 16
    mix_diag = []

    def mix_all(pairs_at):
        outs = []
        for i in range(0, n_w, chunk):
            c = min(chunk, n_w - i)
            outs.append(
                jnp.asarray(
                    _device_mix(mix_function, pairs_at(i, c), sr=sr, diag=mix_diag)
                )
            )
        return jnp.concatenate(outs, axis=0)

    out = {}
    aligned_mix = mix_all(lambda i, c: w[i : i + c])
    out[ItemCategory.aligned] = embed_set(aligned_mix, store_mix)
    del aligned_mix
    if apa_mode == "reference":
        # Derangement, not a plain permutation: rng.permutation has ~1
        # expected fixed point, which would leak an aligned pair into the
        # misaligned set and bias APA upward for small window counts.  A
        # conjugated nonzero cyclic shift (pairing[p[k]] = p[(k+s) % n]) has
        # no fixed points by construction.
        rng = np.random.default_rng(seed)
        if n_w > 1:
            p = rng.permutation(n_w)
            s = int(rng.integers(1, n_w))
            derangement = np.empty(n_w, np.int64)
            derangement[p] = np.roll(p, -s)
        else:
            derangement = np.zeros(1, np.int64)  # degenerate: self-pair
        perm = jnp.asarray(derangement)

        def mis_at(i, c):
            return jnp.stack([w[i : i + c, :, 0], w[perm[i : i + c], :, 1]], axis=2)

        mis_mix = mix_all(mis_at)
        out[ItemCategory.misaligned] = embed_set(mis_mix, store_mix)
        del mis_mix
    if stems_mode:
        out[ItemCategory.stem] = embed_set(w[:, :, 1], store_stem)
    emit_mix_diagnostics(mix_diag)
    return out


def _device_array_batches(windows, win_len, batch_size, hop_len):
    """Batches from a device-resident input: (N, n_samples) jax array of mono
    stems.  Slicing/reshaping happens on device — nothing round-trips to
    host, so a pipeline fed with device-resident audio (e.g. the output of a
    generative model under evaluation) streams at HBM speed.
    """
    windows = _device_windows(windows, win_len, hop_len)
    if windows is None:
        return
    n = windows.shape[0]
    pad = (-n) % batch_size
    if pad:
        windows = jnp.pad(windows, ((0, pad), (0, 0)))
    category_full = np.full(batch_size, int(ItemCategory.stem), np.int32)
    for start in range(0, n, batch_size):
        m = min(batch_size, n - start)
        audio = _slice_batch_jit(windows, start, batch_size)
        valid = np.zeros(batch_size, bool)
        valid[:m] = True
        category = np.where(valid, category_full, 0).astype(np.int32)
        yield "mono", audio, category, valid


# ----------------------------------------------------------------------
# device-side stages
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cats",))
def _category_moments_jit(emb, cat, val, cats: tuple[int, ...]):
    out = {}
    for c in cats:
        mask = jnp.logical_and(cat == c, val)
        out[c] = batch_moments(emb, mask)
    return out


def _category_moments(embedding, category, valid, wanted: tuple[int, ...]):
    """Masked raw moments per category in one jitted program."""
    return _category_moments_jit(
        jnp.asarray(embedding), jnp.asarray(category), jnp.asarray(valid), wanted
    )


@partial(jax.jit, static_argnames=("cats",), donate_argnums=(0,))
def _moments_merge_jit(acc, emb, cat, val, cats: tuple[int, ...]):
    """Per-batch moments + accumulator merge in ONE dispatch (dispatch
    latency through remote-device links is material at small batch counts)."""
    new = {}
    for c in cats:
        mask = jnp.logical_and(cat == c, val)
        new[c] = batch_moments(emb, mask)
    return _merge_moments(acc, new)


def _merge_moments(acc, new):
    """Chan/parallel combine of (n, sum_x, centered-M2) pytrees in f64.

    Keeps the running accumulator ON DEVICE across the whole pipeline run —
    no per-batch host sync; the host pulls one tiny (n, d, d x d) pytree at
    the end.  The d x d combine is trivial work, so f64 is free, and the
    result is psum-consistent across mesh shardings.
    """
    out = {}
    for c, (n1, s1, m1) in acc.items():
        n2, s2, m2 = new[c]
        n1 = n1.astype(jnp.float64)
        n2 = n2.astype(jnp.float64)
        s1 = s1.astype(jnp.float64)
        s2 = s2.astype(jnp.float64)
        m1 = m1.astype(jnp.float64)
        m2 = m2.astype(jnp.float64)
        n_t = n1 + n2
        mean1 = s1 / jnp.maximum(n1, 1.0)
        mean2 = s2 / jnp.maximum(n2, 1.0)
        d = mean2 - mean1
        w = jnp.where(n_t > 0, n1 * n2 / jnp.maximum(n_t, 1.0), 0.0)
        m_t = m1 + m2 + w * jnp.outer(d, d)
        out[c] = (n_t, s1 + s2, m_t)
    return out


_merge_moments_jit = partial(jax.jit, donate_argnums=(0,))(_merge_moments)


def _progress_iter(items, source, desc):
    """tqdm over a host stream; total from len() when the source has one
    (stage-level visibility, reference cpu_parallel.py:45-47)."""
    try:
        from tqdm import tqdm
    except ImportError:
        return items
    try:
        total = len(source)
    except TypeError:
        total = None
    return tqdm(items, desc=desc, total=total, leave=False, unit="song")


def _device_mix(mix_function, audio, sr, diag=None):
    """Apply a mix function to a (B, n, 2) batch.

    Registry mix functions are batched jax programs (``is_batched_mix``);
    arbitrary user callables follow the reference protocol
    ``f(audio[n, 2], sr) -> mono[n]`` (mix_functions.py:335-344) and are
    applied per item on host.  ``diag`` collects device diagnostic flags
    (silent channels, limited peaks) without syncing; the caller emits the
    warnings once at the end of the run (ops/mix.emit_mix_diagnostics).
    """
    if getattr(mix_function, "is_batched_mix", False):
        return mix_function(audio, sr=sr, diag=diag)  # stays on device
    audio = ensure_ndarray(audio)
    out = [ensure_ndarray(mix_function(a, sr=sr)) for a in audio]
    return np.stack(out).astype(np.float32, copy=False)


def _device_resample(audio, sr_orig, sr_new):
    from ..ops.resample import resample_batch

    quality = os.environ.get("AM_TPU_RESAMPLE_QUALITY", "hq")
    return resample_batch(audio, sr_orig, sr_new, quality)


@jax.jit
def _dequantize_jit(q, scale):
    return q.astype(jnp.float32) * (scale / 32767.0)


def _quantize_host(audio: np.ndarray):
    """Lossy-but-negligible int16 transfer encoding (~96 dB SNR), halving
    host->device bytes.  Opt-in via AM_TPU_TRANSFER_INT16=1 — on hosts where
    PCIe/interconnect to the accelerator is the pipeline bottleneck."""
    scale = float(max(np.abs(audio).max(), 1e-9))
    q = np.clip(audio * (32767.0 / scale), -32767, 32767).astype(np.int16)
    return q, np.float32(scale)


# Single host->device transfers above ~100 MB wedge remote-device relays
# (CLAUDE.md); 64 rows x 240k f32 = 61 MB stays comfortably under.  Staging
# costs nothing on transfer-bound links (same bytes, same serialized
# stream) and protects large-batch configs (batch_size 256 x 5 s @ 48 kHz
# would otherwise be one 246 MB put).
_STAGE_ROWS = int(os.environ.get("AM_TPU_UPLOAD_STAGE_ROWS", "64"))
_STAGE_BYTES = 64 << 20


def _staged_device_put(audio: np.ndarray, sharding=None):
    """Upload a host batch in bounded row slices, concatenated on device."""
    nbytes = audio.size * audio.itemsize
    rows = audio.shape[0] if audio.ndim else 0
    if nbytes <= _STAGE_BYTES or rows <= _STAGE_ROWS:
        if sharding is not None:
            return jax.device_put(audio, sharding)
        return jnp.asarray(audio)
    parts = [
        jnp.asarray(audio[i : i + _STAGE_ROWS])
        for i in range(0, rows, _STAGE_ROWS)
    ]
    out = jnp.concatenate(parts, axis=0)
    return jax.device_put(out, sharding) if sharding is not None else out


# ----------------------------------------------------------------------
# the pipeline
# ----------------------------------------------------------------------
def embedding_pipeline(
    waveforms,
    embedder,
    mix_function,
    apa_mode=None,  # "reference" | "candidate" | None
    stems_mode: bool = False,
    store_mix_embeddings: bool = False,
    store_stem_embeddings: bool = False,
    batch_size: int = 32,
    win_dur: float = 5.0,
    hop_dur: float | None = None,
    song_buffer_size: int = 100,
    win_buffer_size: int = 1000,
    win_min_age: int = 100,
    seed: int | None = None,
    input_sr: int | None = None,
    mesh=None,
    use_native: bool | None = None,
    progress: bool = False,
) -> dict:
    """Embed a stream of waveforms and accumulate per-category statistics.

    Input formats match reference embed.py:110-147: an iterable (or stacked
    array) of items, each ``(n_samples,)`` mono stems or ``(n_samples, 2)``
    context+stem pairs.  Returns ``{ItemCategory: AudioMetricsData}``.
    """
    in_sr = input_sr if input_sr is not None else embedder.sr
    need_resample = input_sr is not None and input_sr != embedder.sr

    # SPMD over the mesh: batches are sharded on the leading axis, embedder
    # params replicated; jit/GSPMD inserts the cross-chip reductions for the
    # moment sums.  Batch size must tile evenly over the chips.
    batch_sharding_ = None
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        from .mesh import batch_sharding

        if batch_size % mesh.size:
            batch_size = -(-batch_size // mesh.size) * mesh.size
        batch_sharding_ = batch_sharding(mesh)
        if hasattr(embedder, "shard"):
            embedder.shard(mesh)

    if use_native is None:
        use_native = os.environ.get("AM_TPU_NATIVE_LOADER") == "1"
    if use_native and hop_dur is not None:
        use_native = False  # the C++ batcher cuts non-overlapping windows
    if use_native:
        from .native_loader import native_available

        use_native = native_available()

    device_resident_pairs = (
        isinstance(waveforms, jax.Array)
        and waveforms.ndim == 3
        and waveforms.shape[-1] == 2
        and apa_mode is not None
        and not need_resample
        and embedder.embed_fn is not None
    )
    if device_resident_pairs:
        win_len = window_length(in_sr, win_dur)
        hop_len = win_len if hop_dur is None else window_length(in_sr, hop_dur)
        w = _device_windows_pair(waveforms, win_len, hop_len)
        if w is not None:
            return _device_pair_eval(
                w,
                embedder,
                mix_function,
                embedder.sr,
                apa_mode,
                stems_mode,
                batch_size,
                seed,
                store_mix_embeddings,
                store_stem_embeddings,
                mesh=mesh,
            )

    device_resident = (
        isinstance(waveforms, jax.Array)
        and waveforms.ndim == 2
        and apa_mode is None
        and stems_mode
        and not need_resample
    )
    if device_resident and embedder.embed_fn is not None:
        win_len = window_length(in_sr, win_dur)
        hop_len = win_len if hop_dur is None else window_length(in_sr, hop_dur)
        w = _device_windows(waveforms, win_len, hop_len)
        if w is not None:
            n = w.shape[0]
            buf, triples = _run_fused_embed(embedder, w, n, batch_size, mesh)
            amd = AudioMetricsData(store_stem_embeddings)
            for nn_h, s1_h, m2_h in triples:
                amd.add_moments_device(nn_h, s1_h, m2_h)
            if store_stem_embeddings:
                amd._embedding_chunks.append(buf[:n])
                amd._embeddings_cat = None
                amd._embeddings_dev = None
            return {ItemCategory.stem: amd}

    if device_resident:
        win_len = window_length(in_sr, win_dur)
        batches = _device_array_batches(
            waveforms,
            win_len,
            batch_size,
            win_len if hop_dur is None else window_length(in_sr, hop_dur),
        )
    elif use_native:
        if progress:
            waveforms = _progress_iter(iter(waveforms), waveforms, "songs")
        batches = _native_batches(
            waveforms,
            batch_size=batch_size,
            win_len=window_length(in_sr, win_dur),
            apa_mode=apa_mode,
            stems_mode=stems_mode,
            seed=seed,
            song_buffer=song_buffer_size,
            win_buffer=win_buffer_size,
            win_min_age=win_min_age,
        )
    else:
        items = iter(waveforms)
        if progress:
            items = _progress_iter(items, waveforms, "songs")

        if apa_mode == "reference":
            # song-level shuffle so misaligned pairs cross song boundaries
            items = (ensure_ndarray(x) for x in items)
            items = shuffle_stream(items, buffer_size=song_buffer_size, seed=seed)

        # window at the input rate; resampling happens on device per batch
        windows = multi_audio_slicer(items, win_dur, sr=in_sr, hop_dur=hop_dur)

        if apa_mode == "reference":
            windows, shuffled = tee(windows)
            shuffled = shuffle_stream(
                shuffled,
                buffer_size=win_buffer_size,
                min_age=win_min_age,
                seed=seed,
            )
        else:
            shuffled = None

        categorized = serialize_items(windows, shuffled, apa_mode, stems_mode)
        batches = _bucketed_batches(
            categorized, batch_size, pad_host=batch_sharding_ is not None
        )

    # result accumulators (reference embed.py:218-224)
    metrics_data: dict[ItemCategory, AudioMetricsData] = {}
    if apa_mode is not None:
        metrics_data[ItemCategory.aligned] = AudioMetricsData(store_mix_embeddings)
    if apa_mode == "reference":
        metrics_data[ItemCategory.misaligned] = AudioMetricsData(store_mix_embeddings)
    if stems_mode:
        metrics_data[ItemCategory.stem] = AudioMetricsData(store_stem_embeddings)

    store_flags = {
        ItemCategory.aligned: store_mix_embeddings,
        ItemCategory.misaligned: store_mix_embeddings,
        ItemCategory.stem: store_stem_embeddings,
    }
    all_cats = tuple(int(c) for c in metrics_data)
    pair_cats = tuple(
        int(c)
        for c in (ItemCategory.aligned, ItemCategory.misaligned)
        if ItemCategory(c) in metrics_data
    )
    stem_cats = (int(ItemCategory.stem),) if ItemCategory.stem in metrics_data else ()
    # running moment accumulators live on device; the host pulls one tiny
    # pytree at the end of the stream (no per-batch sync)
    acc = None
    stored: dict[int, list] = {
        int(c): [] for c in metrics_data if store_flags[ItemCategory(c)]
    }

    transfer_int16 = os.environ.get("AM_TPU_TRANSFER_INT16") == "1"

    if progress:
        try:
            from tqdm import tqdm

            batches = tqdm(batches, desc="embedding batches", leave=False, unit="batch")
        except ImportError:
            pass

    mix_diag = []
    for kind, audio, category, valid in batches:
        if transfer_int16 and isinstance(audio, np.ndarray):
            q, scale = _quantize_host(audio)
            q = _staged_device_put(q, batch_sharding_)
            audio = _dequantize_jit(q, scale)
        elif isinstance(audio, np.ndarray):
            audio = _staged_device_put(audio, batch_sharding_)
        elif batch_sharding_ is not None:
            audio = jax.device_put(jnp.asarray(audio), batch_sharding_)
        if audio.shape[0] < batch_size:
            # partial final batch: only the real rows crossed the host link
            # (_bucketed_batches pad_host=False); pad to the fixed program
            # shape on device — HBM zeros are ~free, relay bytes are not
            audio = jnp.concatenate(
                [
                    audio,
                    jnp.zeros(
                        (batch_size - audio.shape[0],) + audio.shape[1:],
                        audio.dtype,
                    ),
                ],
                axis=0,
            )
        if need_resample:
            audio = _device_resample(audio, input_sr, embedder.sr)
        if kind == "pair":
            n_before = len(mix_diag)
            mono = _device_mix(mix_function, audio, sr=embedder.sr, diag=mix_diag)
            if len(mix_diag) > n_before:
                # mask padding rows out of the diagnostics (all-zero pad
                # windows would read as "both channels silent")
                mix_diag[-1] = {**mix_diag[-1], "valid": np.asarray(valid)}
            if os.environ.get("AM_TPU_DEBUG_NAN"):
                # failure-detection parity with the reference's NaN debug
                # print in mixing (mix_functions.py:328-331); opt-in since it
                # forces a device sync per batch
                bad = int(np.sum(~np.isfinite(ensure_ndarray(mono))))
                if bad:
                    import warnings

                    warnings.warn(f"mix produced {bad} non-finite samples")
            wanted = pair_cats
        else:
            mono = audio
            wanted = stem_cats

        embedding = embedder.forward({"audio": mono})["embedding"]

        if acc is None:
            acc = _category_moments(embedding, category, valid, all_cats)
        else:
            acc = _moments_merge_jit(
                acc,
                jnp.asarray(embedding),
                jnp.asarray(category),
                jnp.asarray(valid),
                all_cats,
            )

        for c in stored:
            if c in wanted:
                mask = (category == c) & valid
                n_sel = int(mask.sum())
                if n_sel:
                    if mask[:n_sel].all():
                        # contiguous prefix (stems / device-resident paths):
                        # keep the rows ON DEVICE — a lazy static slice, no
                        # host round-trip (the host link is often the
                        # bottleneck; embeddings are consumed on device by
                        # KD/PRDC/recompute_stats anyway)
                        stored[c].append(embedding[:n_sel])
                    else:
                        # interleaved categories (APA pair batches)
                        stored[c].append(ensure_ndarray(embedding)[mask])

    emit_mix_diagnostics(mix_diag)
    if acc is not None:
        acc_host = jax.device_get(acc)
        for c, (n, s1, m2) in acc_host.items():
            metrics_data[ItemCategory(c)].add_moments(n, s1, m2)
    for c, chunks in stored.items():
        amd = metrics_data[ItemCategory(c)]
        for rows in chunks:
            if isinstance(rows, np.ndarray):
                rows = rows.astype(np.float32, copy=False)
            amd._embedding_chunks.append(rows)
        amd._embeddings_cat = None
        amd._embeddings_dev = None

    return metrics_data
