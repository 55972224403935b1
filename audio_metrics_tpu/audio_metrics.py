"""Top-level AudioMetrics API.

Mirror of reference src/audio_metrics/audio_metrics.py:15-313, the single
public class of the library: configuration via registries, reference-set
accumulation, lazy PCA projection, metric dispatch (FAD / KD / PRDC / APA)
and state persistence.  Differences from the reference are TPU-idiomatic:

- ``device_indices`` selects jax devices and builds a 1-D data-parallel mesh
  (the reference builds a CUDA free-GPU queue and *raises* on CPU-only hosts,
  gpu_parallel.py:27-28; here everything runs wherever jax runs).
- State is saved as a pickle-free ``.npz`` archive instead of ``torch.save``.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

from .data import AudioMetricsData, flush_pending_stats
from .metrics.fad import fad_device_tail, fad_inf_parts, frechet_distance
from .metrics.kd import kernel_distance
from .metrics.prdc import prdc
from .metrics.apa import apa, apa_compute_d_x_xp
from .projection import IncrementalPCA
from .models import EMBEDDERS, DEFAULT_EMBEDDER
from .parallel.pipeline import embedding_pipeline, ItemCategory
from .parallel.mesh import make_mesh
from .utils.serialize import save_state_dict, load_state_dict

# Defer the candidate moment pull into the FAD thread (overlapping the
# KD/PRDC device sweeps).  Off by default: measured slower through the dev
# relay's serialized stream — see evaluate().  Read at import.
_LAZY_TAIL = bool(os.environ.get("AM_TPU_LAZY_TAIL"))

__all__ = ["AudioMetrics"]

logger = logging.getLogger(__name__)


class AudioMetrics:
    # metrics that need the full embeddings (not just mu, sigma)
    _need_embeddings = set(("kd", "precision", "prdc", "fad_inf"))
    # AudioMetricsData attributes included in serialization
    _amd = (
        "stem_reference",
        "mix_reference",
        "mix_anti_reference",
        "stem_reference_pca",
        "mix_reference_pca",
        "mix_anti_reference_pca",
    )

    def __init__(
        self,
        metrics=["apa", "fad"],
        n_pca=None,
        device_indices=None,
        embedder=None,
        mix_function=None,
        win_dur=5.0,
        hop_dur=None,
        input_sr=None,
        batch_size=32,
        progress=False,
        dcn_slices=None,
    ):
        """``hop_dur`` (seconds) enables overlapping windows (hop < win);
        default None means non-overlapping, the reference behaviour (its
        ``audio_slicer`` supports a hop too but never exposes it,
        reference util/audio.py:4-9).  Note: ``hop_dur`` routes streaming
        input through the Python feeder — the native (C++) batcher cuts
        non-overlapping windows only.

        ``dcn_slices`` (or ``AM_TPU_DCN_SLICES``): build a 2-D
        ``("dcn", "data")`` mesh for pod-scale evaluation across multiple
        ICI slices — the batch shards over both axes and only KB-sized
        moment/metric partials ever cross DCN (parallel/mesh.py)."""
        if dcn_slices is None:
            dcn_slices = int(os.environ.get("AM_TPU_DCN_SLICES", "0")) or None
        self.mesh = self._get_mesh(device_indices, dcn_slices)
        self.metrics = metrics
        self.need_apa = "apa" in self.metrics
        self.win_dur = win_dur
        self.hop_dur = hop_dur
        self.input_sr = input_sr
        self.batch_size = batch_size
        self.progress = progress
        if n_pca is None:
            self.stem_projection = None
            self.mix_projection = None
        else:
            self.stem_projection = IncrementalPCA(n_components=n_pca)
            self.mix_projection = IncrementalPCA(n_components=n_pca)

        if embedder is None or isinstance(embedder, str):
            self.embedder = self.get_embedder(embedder)
        else:
            self.embedder = embedder

        if mix_function is None or isinstance(mix_function, str):
            self.mix_function = self.get_mix_function(mix_function)
        else:
            self.mix_function = mix_function

        self.apa_d_x_xp = None

        if self.need_apa:
            self.mix_reference = AudioMetricsData(self.store_mix_embeddings)
            self.mix_anti_reference = AudioMetricsData(self.store_mix_embeddings)
        else:
            self.mix_reference = None
            self.mix_anti_reference = None

        if self.stems_mode:
            self.stem_reference = AudioMetricsData(self.store_stem_embeddings)
        else:
            self.stem_reference = None

        self.mix_reference_pca = None
        self.mix_anti_reference_pca = None
        self.stem_reference_pca = None

    # ------------------------------------------------------------------
    # configuration
    # ------------------------------------------------------------------
    @property
    def stems_mode(self) -> bool:
        return any(metric for metric in self.metrics if metric != "apa")

    @property
    def store_mix_embeddings(self) -> bool:
        return self.need_apa and self.mix_projection is not None

    @property
    def store_stem_embeddings(self) -> bool:
        return self.stem_projection is not None or any(
            metric in self._need_embeddings for metric in self.metrics
        )

    def _get_mesh(self, device_indices, dcn_slices=None):
        if device_indices or device_indices is None:
            try:
                return make_mesh(device_indices, dcn_slices=dcn_slices)
            except RuntimeError as exc:
                if device_indices is not None:
                    # the user ASKED for specific devices; a silent
                    # single-device fallback would hide a misconfigured
                    # multi-chip run
                    raise
                logger.warning(
                    "no usable device mesh (%s); running single-device", exc
                )
                return None
        return None

    def get_mix_function(self, mix_function):
        from .ops.mix import MIX_FUNCTIONS, DEFAULT_MIX_FUNCTION

        if mix_function is None:
            mix_function = DEFAULT_MIX_FUNCTION
        func = MIX_FUNCTIONS.get(mix_function)
        if func is None:
            msg = (
                f"Unknown mix_function {mix_function}, must be one of "
                f"{MIX_FUNCTIONS.keys()}"
            )
            raise ValueError(msg)
        return func

    def get_embedder(self, embedder):
        if embedder is None:
            embedder = DEFAULT_EMBEDDER
        info = EMBEDDERS.get(embedder)
        if info is None:
            msg = f"Unknown embedder {embedder}, must be one of {EMBEDDERS.keys()}"
            raise ValueError(msg)
        factory, kwargs_factory = info
        return factory(**kwargs_factory())

    # ------------------------------------------------------------------
    # reference handling
    # ------------------------------------------------------------------
    def _run_pipeline(self, waveforms, apa_mode):
        return embedding_pipeline(
            waveforms,
            embedder=self.embedder,
            mix_function=self.mix_function,
            apa_mode=apa_mode,
            stems_mode=self.stems_mode,
            store_mix_embeddings=self.store_mix_embeddings,
            store_stem_embeddings=self.store_stem_embeddings,
            batch_size=self.batch_size,
            win_dur=self.win_dur,
            hop_dur=self.hop_dur,
            input_sr=self.input_sr,
            mesh=self.mesh,
            progress=self.progress,
        )

    def add_reference(self, reference) -> None:
        metrics = self._run_pipeline(
            reference, apa_mode="reference" if self.need_apa else None
        )

        stem_reference = metrics.get(ItemCategory.stem)
        if stem_reference is not None:
            self.stem_reference_pca = None  # invalidate cache
            self.stem_reference += stem_reference
            self.stem_reference.recompute_stats()

        mix_reference = metrics.get(ItemCategory.aligned)
        if mix_reference is not None:
            self.mix_reference_pca = None  # invalidate caches
            self.mix_anti_reference_pca = None
            self.mix_reference += mix_reference

        mix_anti_reference = metrics.get(ItemCategory.misaligned)
        if mix_anti_reference is not None:
            self.mix_anti_reference += mix_anti_reference

    def reset_reference(self) -> None:
        if self.need_apa:
            self.apa_d_x_xp = None
            self.mix_reference = AudioMetricsData(self.store_mix_embeddings)
            self.mix_anti_reference = AudioMetricsData(self.store_mix_embeddings)
            self.mix_reference_pca = None
            self.mix_anti_reference_pca = None
        if self.stems_mode:
            self.stem_reference = AudioMetricsData(self.store_stem_embeddings)
            self.stem_reference_pca = None

    def precompile(self, n_items: int = 256) -> None:
        """Compile and register every device program for an eval set of
        ``n_items`` windows (add_reference AND evaluate paths) on synthetic
        on-device audio, then restore the instance's reference state.

        Production warm-up hook (no reference equivalent): on
        remote-attached accelerators each program's first execution pays
        compile + executable registration — seconds to minutes depending on
        link state (bench.py's warmup ledger attributes it per program).
        Calling this at process start moves that cost off the first real
        ``evaluate``.  Programs are cached per input shape: use the same
        window count and ``batch_size`` as production traffic, and enable
        the persistent compile cache (``AM_TPU_COMPILE_CACHE=1``) so even
        the compiles survive process restarts.
        """
        import jax
        import jax.numpy as jnp

        snapshot = {a: getattr(self, a) for a in self._amd}
        snapshot["apa_d_x_xp"] = self.apa_d_x_xp
        sr = self.input_sr if self.input_sr is not None else self.embedder.sr
        win = int(round(self.win_dur * sr))
        shape = (n_items, win, 2) if self.need_apa else (n_items, win)
        gen = jax.jit(
            lambda k: 0.2 * jax.random.normal(k, shape, jnp.float32)
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        try:
            self.reset_reference()
            self.add_reference(gen(k1))
            self.evaluate(gen(k2))
        finally:
            for a, v in snapshot.items():
                setattr(self, a, v)

    # ------------------------------------------------------------------
    # PCA projections (lazy, cached; reference audio_metrics.py:163-209)
    # ------------------------------------------------------------------
    @staticmethod
    def _projected_stats(projection, embeddings, store_embeddings):
        """Project raw embeddings and re-accumulate their statistics."""
        stats = AudioMetricsData(store_embeddings)
        stats.add(projection.transform(embeddings))
        return stats

    def ensure_stem_projection(self, ref, cand):
        if self.stem_projection is None:
            return ref, cand
        store = any(m in self._need_embeddings for m in self.metrics)
        if self.stem_reference_pca is None:
            # Fit once, on the reference only; every later candidate is
            # projected with the frozen basis so repeated evaluate() calls
            # stay mutually comparable.  add_reference invalidates this.
            self.stem_projection.partial_fit(ref.embeddings)
            self.stem_reference_pca = self._projected_stats(
                self.stem_projection, ref.embeddings, store
            )
        cand = self._projected_stats(self.stem_projection, cand.embeddings, store)
        return self.stem_reference_pca, cand

    def ensure_mix_projection(self, ref, anti_ref, cand):
        if self.mix_projection is None:
            return ref, anti_ref, cand
        if self.mix_reference_pca is None:
            self.mix_projection.partial_fit(ref.embeddings)
            # Projected mix stats feed APA's Frechet distances, which read
            # (mu, Sigma) only — raw projected embeddings are not retained.
            self.mix_reference_pca = self._projected_stats(
                self.mix_projection, ref.embeddings, False
            )
            self.mix_anti_reference_pca = self._projected_stats(
                self.mix_projection, anti_ref.embeddings, False
            )
        cand = self._projected_stats(self.mix_projection, cand.embeddings, False)
        return self.mix_reference_pca, self.mix_anti_reference_pca, cand

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def __call__(self, candidate) -> dict:
        return self.evaluate(candidate)

    def evaluate(self, candidate) -> dict:
        """Compute the configured metrics for ``candidate`` vs the reference.

        Wall-clock stage timings of the last call are kept in
        ``self.timings`` (seconds): ``pipeline`` (ingest + embed + the
        coalesced candidate moment pull — deferred into the FAD thread
        when ``AM_TPU_LAZY_TAIL=1``), ``projection``, ``fad``/``apa``
        (host math), ``finalize`` (KD/PRDC device sync).  With the
        default FAD device tail (``AM_TPU_FAD_TAIL=eigdev``) the
        pipeline stage issues no device sync at all, so the whole device
        stream drains in ``finalize_pull`` — for per-stage attribution
        set ``AM_TPU_TIMING_SYNC=1`` (re-inserts the pipeline-end sync,
        costs one extra small pull) or use ``AM_TPU_FAD_TAIL=packed`` /
        ``host``.
        """
        import time as _time

        self.assert_reference()
        self.timings = {}
        _t0 = _time.perf_counter()

        metrics = self._run_pipeline(
            candidate, apa_mode="candidate" if self.need_apa else None
        )
        # FAD device tail: run the similarity transform M = L^T C L on
        # device (f32 MXU gemms vs ~18 ms of single-core host f64 BLAS) so
        # the FAD thread below only eigendecomposes; in "eigdev" mode even
        # that runs on device and only 512 eigenvalues cross the link
        # instead of the (d, d) moment.  Falls back to the host f64 path
        # (fad_tail None) for host-fed/low-rank/projected candidates.
        fad_tail = None
        fad_cand = None
        if "fad" in self.metrics and self.stem_projection is None:
            fad_cand = metrics.get(ItemCategory.stem)
            if fad_cand is not None and self.stem_reference is not None:
                fad_tail = fad_device_tail(fad_cand, self.stem_reference)
        fad_defer = fad_tail is not None and fad_tail[2]
        fad_tail_host = None
        if not _LAZY_TAIL:
            # Materialize the candidate's device moments NOW, in the post-
            # embed idle window and as ONE coalesced transfer across
            # categories.  Deferring this pull into the FAD thread (so it
            # overlaps the KD/PRDC sweeps) measured SLOWER on the dev relay
            # (2949 -> 2628 clips/s): that link executes transfers and
            # kernels on one serialized stream, so the deferred (d, d) pull
            # queues behind the sweeps instead of riding the idle window.
            # On hosts whose DMA overlaps compute, AM_TPU_LAZY_TAIL=1
            # defers it.  With an active FAD device tail the candidate's
            # own moment stays on device (the pulled transform replaces
            # it); in "eigdev" mode even the transform's outputs are ~4 KB
            # and ride the finalize pull instead (fad_defer).
            fad_tail_host = flush_pending_stats(
                [m for m in metrics.values() if fad_tail is None or m is not fad_cand],
                extra=fad_tail[0] if fad_tail is not None and not fad_defer else None,
            )
        if os.environ.get("AM_TPU_TIMING_SYNC") and fad_defer and not _LAZY_TAIL:
            # Diagnostic only: in the default eigdev FAD mode nothing syncs
            # here (the whole stream drains in finalize_pull), so per-stage
            # attribution is lost.  This re-inserts the sync eigdev removed
            # — a ~4 KB pull of the FAD-tail arrays, discarded — so
            # timings["pipeline"] is meaningful again (used by
            # scripts/probe_eval_stall.py and the bench detail run).
            import jax as _jax

            _jax.device_get(fad_tail[0])
        self.timings["pipeline"] = _time.perf_counter() - _t0

        stem_cand = metrics.get(ItemCategory.stem)
        apa_cand = metrics.get(ItemCategory.aligned)
        stem_ref = self.stem_reference
        apa_ref = self.mix_reference
        apa_anti_ref = self.mix_anti_reference

        if self.stems_mode and stem_cand is None:
            raise ValueError("No stem candidate embeddings were computed")
        if self.need_apa and apa_cand is None:
            raise ValueError("No apa candidate embeddings were computed")

        _t0 = _time.perf_counter()
        if self.stems_mode:
            stem_ref, stem_cand = self.ensure_stem_projection(stem_ref, stem_cand)

        if self.need_apa:
            apa_ref, apa_anti_ref, apa_cand = self.ensure_mix_projection(
                apa_ref, apa_anti_ref, apa_cand
            )
            if self.apa_d_x_xp is None:
                self.apa_d_x_xp = apa_compute_d_x_xp(apa_ref, apa_anti_ref)
        self.timings["projection"] = _time.perf_counter() - _t0

        # KD/PRDC device programs are DISPATCHED first (lazy) so FAD's
        # host-side f64 eigh overlaps the device sweeps; the syncs happen in
        # the finalize calls.  Same results, same keys, ~the host-eigh time
        # saved per evaluate.
        _t0 = _time.perf_counter()
        pending = []  # (device_arrays, host_reduce), reference key order kept
        if "kd" in self.metrics:
            pending.append(
                kernel_distance(stem_cand, stem_ref, mesh=self.mesh, lazy="parts")
            )
            self.timings["kd_dispatch"] = _time.perf_counter() - _t0
        if "prdc" in self.metrics:
            _t0 = _time.perf_counter()
            k = max(1, min(10, len(stem_ref), len(stem_cand)))
            pending.append(
                prdc(stem_ref, stem_cand, k, mesh=self.mesh, lazy="parts")
            )
            self.timings["prdc_dispatch"] = _time.perf_counter() - _t0
        if "fad_inf" in self.metrics:
            # beyond-reference extension: sample-bias-corrected FAD via
            # subset-size extrapolation (metrics/fad.py::fad_inf_parts);
            # rides the same lazy-parts protocol and coalesced pull
            _t0 = _time.perf_counter()
            parts = fad_inf_parts(stem_cand, stem_ref)
            if parts is not None:
                pending.append(parts)
            self.timings["fad_inf_dispatch"] = _time.perf_counter() - _t0

        result = {}
        fad_thread = None
        fad_out: dict = {}
        if "fad" in self.metrics and not (fad_defer and not _LAZY_TAIL):
            _t0 = _time.perf_counter()

            def _fad():
                try:
                    if fad_tail is not None:
                        vals = fad_tail_host
                        if vals is None:  # AM_TPU_LAZY_TAIL: pull here
                            import jax

                            vals = jax.device_get(fad_tail[0])
                        fad_out["fad"] = float(fad_tail[1](vals))
                    else:
                        fad_out["fad"] = frechet_distance(stem_cand, stem_ref)
                except BaseException as exc:  # re-raised after join
                    fad_out["error"] = exc

            if pending:
                # Host f64 eigvalsh (LAPACK, GIL-free) overlaps the blocking
                # KD/PRDC device pull below — the evaluate tail costs
                # max(fad, pull) instead of fad + pull.
                import threading

                fad_thread = threading.Thread(target=_fad)
                fad_thread.start()
            else:
                _fad()
                self.timings["fad"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        pulled = []
        fad_deferred_host = None
        if pending or (fad_defer and not _LAZY_TAIL):
            import jax

            # ONE transfer for every pending metric's device arrays — plus
            # the deferred FAD eigenvalues (~4 KB) when the device tail runs
            # in "eigdev" mode (each pull is a full round trip on
            # remote-device links)
            fad_arrs = fad_tail[0] if fad_defer and not _LAZY_TAIL else None
            fad_deferred_host, host = jax.device_get(
                (fad_arrs, tuple(arrs for arrs, _ in pending))
            )
            # device leg of the tail (KD/PRDC sweeps + pull), separate from
            # the FAD host leg so the binding side is attributable
            self.timings["finalize_pull"] = _time.perf_counter() - _t0
            for (_, host_reduce), h in zip(pending, host):
                pulled.append(host_reduce(h))
        if fad_thread is not None:
            fad_thread.join()
            self.timings["fad_overlapped"] = _time.perf_counter() - _t0
        err = fad_out.pop("error", None)
        if err is not None:
            raise err
        if fad_deferred_host is not None:
            fad_out["fad"] = float(fad_tail[1](fad_deferred_host))
        result.update(fad_out)  # reference key order: fad first
        for out in pulled:
            result.update(out)
        self.timings["finalize"] = _time.perf_counter() - _t0
        if self.need_apa:
            _t0 = _time.perf_counter()
            result["apa"] = apa(apa_cand, apa_ref, apa_anti_ref, self.apa_d_x_xp)
            self.timings["apa"] = _time.perf_counter() - _t0
        return result

    def assert_reference(self) -> None:
        msg = (
            "The reference dataset is empty. This can have various causes:"
            "  - You have not called AudioMetrics.add_reference()"
            "  - You have called AudioMetrics.add_reference() with an empty dataset"
            f"  - The duration of your audio is shorter than `win_dur` ({self.win_dur}s)."
            "    (You can specify your own `win_dur` when instantiating AudioMetrics)"
        )
        if self.stems_mode and self.stem_reference.n is None:
            raise ValueError(msg)
        if self.need_apa and self.mix_reference.n is None:
            raise ValueError(msg)

    # ------------------------------------------------------------------
    # persistence (reference audio_metrics.py:78-104)
    # ------------------------------------------------------------------
    def save_state(self, fp: str | Path) -> None:
        state = {
            "win_dur": self.win_dur,
            "hop_dur": self.hop_dur,
            "input_sr": self.input_sr,
            "batch_size": self.batch_size,
            "metrics": list(self.metrics),
            "apa_d_x_xp": self.apa_d_x_xp,
        }
        for attr in self._amd:
            item = getattr(self, attr, None)
            state[attr] = item.serialize() if item else None
        for attr in ("stem_projection", "mix_projection"):
            item = getattr(self, attr, None)
            state[attr] = item.__getstate__() if item is not None else None
        save_state_dict(state, fp)

    def load_state(self, fp: str | Path) -> None:
        state = load_state_dict(fp)
        for attr in self._amd:
            item = state.pop(attr, None)
            if item is not None and item.get("n") is not None:
                setattr(self, attr, AudioMetricsData.deserialize(item))
            elif item is not None:
                setattr(self, attr, AudioMetricsData(item.get("store_embeddings", True)))
        for attr in ("stem_projection", "mix_projection"):
            item = state.pop(attr, None)
            if item is not None and getattr(self, attr) is not None:
                getattr(self, attr).__setstate__(item)
        state.pop("metrics", None)
        for k, v in state.items():
            setattr(self, k, v)
