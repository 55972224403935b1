"""ctypes bindings for the native (C++) streaming window batcher.

The native loader (native/am_dataloader.cc) performs the host-side feeder
work — window slicing, song/window reservoir shuffles, misaligned-pair
construction and padded batch assembly — in a background C++ thread, off the
GIL, overlapping batch prep with device compute.  This module loads the
shared library (building it on first use if a toolchain is available) and
exposes a generator with the same output contract as the pure-Python
``_bucketed_batches`` path.

The Python path remains the reference implementation; the native path is an
opt-in accelerator (``AM_TPU_NATIVE_LOADER=1`` or ``use_native=True``).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "NativeBatcher"]

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libam_dataloader.so"
_lib = None
_load_failed = False

_KIND_NAMES = {0: "pair", 1: "mono"}


def _load_library():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    lib_path = _NATIVE_DIR / _LIB_NAME
    src = _NATIVE_DIR / "am_dataloader.cc"
    if src.exists():
        # make is a fast no-op when the .so is up to date, and rebuilds a
        # stale one after source changes (the old missing-file-only check
        # could load an outdated binary)
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as exc:
            if not lib_path.exists():
                logger.warning("native dataloader build failed: %s", exc)
                _load_failed = True
                return None
            logger.warning("native dataloader rebuild failed; using existing: %s", exc)
    elif not lib_path.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError as exc:
        logger.warning("native dataloader load failed: %s", exc)
        _load_failed = True
        return None

    lib.amdl_create.restype = ctypes.c_void_p
    lib.amdl_create.argtypes = [ctypes.c_int] * 7 + [ctypes.c_uint64, ctypes.c_int]
    lib.amdl_feed.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.amdl_finish.argtypes = [ctypes.c_void_p]
    lib.amdl_cancel.argtypes = [ctypes.c_void_p]
    lib.amdl_next_batch.restype = ctypes.c_int
    lib.amdl_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.amdl_error.restype = ctypes.c_int
    lib.amdl_error.argtypes = [ctypes.c_void_p]
    lib.amdl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeBatcher:
    """Streaming batcher backed by the C++ loader.

    Usage::

        nb = NativeBatcher(batch_size, win_len, apa_mode="reference",
                           stems_mode=True, seed=0)
        for song in songs:
            nb.feed(song)           # (n_samples,) or (n_samples, 2) float32
        nb.finish()
        for kind, audio, category, valid in nb:
            ...
    """

    _APA_MODES = {None: 0, "reference": 1, "candidate": 2}

    def __init__(
        self,
        batch_size: int,
        win_len: int,
        apa_mode=None,
        stems_mode: bool = False,
        song_buffer: int = 100,
        win_buffer: int = 1000,
        win_min_age: int = 100,
        seed: int = 0,
        max_ready_batches: int = 4,
    ):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native dataloader unavailable (build failed?)")
        self._lib = lib
        self.batch_size = batch_size
        self.win_len = win_len
        self._handle = lib.amdl_create(
            batch_size,
            win_len,
            self._APA_MODES[apa_mode],
            int(stems_mode),
            song_buffer,
            win_buffer,
            win_min_age,
            seed,
            max_ready_batches,
        )
        self._finished = False

    def feed(self, song) -> None:
        arr = np.ascontiguousarray(song, dtype=np.float32)
        channels = 1 if arr.ndim == 1 else arr.shape[1]
        self._lib.amdl_feed(
            self._handle,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            arr.shape[0],
            channels,
        )

    def finish(self) -> None:
        if not self._finished:
            self._lib.amdl_finish(self._handle)
            self._finished = True

    def cancel(self) -> None:
        """Unblock any thread parked in feed()/iteration (backpressure or
        empty-queue waits).  Safe-teardown contract when feeder threads are
        involved: cancel(), JOIN the feeders, then drop the batcher —
        destroying while a feeder is inside feed() is a use-after-free in
        the native layer."""
        if self._handle:
            self._lib.amdl_cancel(self._handle)
            self._finished = True

    def __iter__(self):
        b, w = self.batch_size, self.win_len
        kind = ctypes.c_int()
        n = ctypes.c_int()
        while True:
            # fresh buffers per batch (yielded directly — no defensive copy);
            # the pair-sized buffer is large enough for both kinds
            audio_pair = np.empty((b, w, 2), np.float32)
            category = np.empty(b, np.int32)
            valid = np.empty(b, np.uint8)
            status = self._lib.amdl_next_batch(
                self._handle,
                audio_pair.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                category.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(kind),
                ctypes.byref(n),
            )
            if status != 1:
                break
            if self._lib.amdl_error(self._handle):
                raise ValueError(
                    "When computing APA items should be tensors/arrays of "
                    "shape [n_samples, 2] (pairing context and stem)"
                )
            if kind.value == 0:  # pair
                yield "pair", audio_pair, category, valid.astype(bool)
            else:
                mono = audio_pair.reshape(-1)[: b * w].reshape(b, w)
                yield "mono", mono, category, valid.astype(bool)
        if self._lib.amdl_error(self._handle):
            raise ValueError(
                "When computing APA items should be tensors/arrays of shape "
                "[n_samples, 2] (pairing context and stem)"
            )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.amdl_destroy(handle)
            self._handle = None
