"""Native (C++) streaming batcher tests: semantics vs the Python feeder."""

import numpy as np
import pytest

from audio_metrics_tpu.parallel.native_loader import NativeBatcher, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native dataloader not built"
)


def _collect(nb):
    return list(nb)


def test_mono_stems_batching():
    win = 100
    nb = NativeBatcher(batch_size=8, win_len=win, stems_mode=True)
    rng = np.random.default_rng(0)
    songs = [rng.normal(size=350).astype(np.float32) for _ in range(4)]
    for s in songs:
        nb.feed(s)
    nb.finish()
    batches = _collect(nb)
    # 4 songs x 3 windows = 12 stems -> one full batch of 8, one partial of 4
    assert [b[3].sum() for b in batches] == [8, 4]
    assert all(b[0] == "mono" for b in batches)
    # windows are exact slices of the input songs, in order
    got = np.concatenate([b[1][b[3]] for b in batches])
    want = np.concatenate([s[: 3 * win].reshape(3, win) for s in songs])
    np.testing.assert_array_equal(got, want)
    cats = np.concatenate([b[2][b[3]] for b in batches])
    assert np.all(cats == 3)


def test_apa_reference_mode_categories():
    win = 50
    n_songs, wins_per_song = 6, 4
    rng = np.random.default_rng(1)
    nb = NativeBatcher(
        batch_size=16,
        win_len=win,
        apa_mode="reference",
        stems_mode=True,
        song_buffer=4,
        win_buffer=8,
        win_min_age=2,
        seed=7,
    )
    for _ in range(n_songs):
        nb.feed(rng.normal(size=(wins_per_song * win, 2)).astype(np.float32))
    nb.finish()
    batches = _collect(nb)
    n_total = n_songs * wins_per_song
    counts = {1: 0, 2: 0, 3: 0}
    for kind, audio, cat, valid in batches:
        for c in cat[valid]:
            counts[int(c)] += 1
        if kind == "pair":
            assert audio.shape[2] == 2
    # every window produces one aligned, one misaligned, one stem item
    assert counts == {1: n_total, 2: n_total, 3: n_total}


def test_apa_misaligned_construction():
    # with min_age large, a misaligned pair's stem must come from a
    # *different* window than its context
    win = 20
    rng = np.random.default_rng(2)
    nb = NativeBatcher(
        batch_size=64,
        win_len=win,
        apa_mode="reference",
        stems_mode=False,
        song_buffer=2,
        win_buffer=10,
        win_min_age=5,
        seed=3,
    )
    songs = [rng.normal(size=(5 * win, 2)).astype(np.float32) for _ in range(4)]
    for s in songs:
        nb.feed(s)
    nb.finish()
    all_windows = np.concatenate(
        [s[: 5 * win].reshape(5, win, 2) for s in songs]
    )  # 20 windows
    ctxs = {w[:, 0].tobytes(): i for i, w in enumerate(all_windows)}
    stems = {w[:, 1].tobytes(): i for i, w in enumerate(all_windows)}
    n_mis = 0
    diff = 0
    for kind, audio, cat, valid in nb:
        for a, c, v in zip(audio, cat, valid):
            if not v or c != 2:
                continue
            n_mis += 1
            ci = ctxs[a[:, 0].tobytes()]
            si = stems[a[:, 1].tobytes()]
            if ci != si:
                diff += 1
    assert n_mis == 20
    # the shuffle guarantees most pairs are cross-window (min_age 5)
    assert diff >= n_mis - 2


def test_apa_candidate_mode():
    win = 30
    rng = np.random.default_rng(4)
    nb = NativeBatcher(batch_size=8, win_len=win, apa_mode="candidate", stems_mode=True)
    nb.feed(rng.normal(size=(4 * win, 2)).astype(np.float32))
    nb.finish()
    counts = {1: 0, 2: 0, 3: 0}
    for _, _, cat, valid in nb:
        for c in cat[valid]:
            counts[int(c)] += 1
    assert counts == {1: 4, 2: 0, 3: 4}


def test_apa_mono_input_raises():
    nb = NativeBatcher(batch_size=4, win_len=10, apa_mode="reference", stems_mode=True)
    nb.feed(np.zeros(50, np.float32))
    nb.finish()
    with pytest.raises(ValueError):
        _collect(nb)


def test_throughput_smoke():
    # the native path must beat ~100 MB/s assembly on any machine
    import time

    win = 80000
    nb = NativeBatcher(batch_size=32, win_len=win, stems_mode=True)
    song = np.zeros(win * 8, np.float32)
    t0 = time.perf_counter()
    for _ in range(16):
        nb.feed(song)
    nb.finish()
    n = sum(int(b[3].sum()) for b in nb)
    dt = time.perf_counter() - t0
    assert n == 128
    mb = n * win * 4 / 1e6
    assert mb / dt > 100, f"native loader too slow: {mb / dt:.1f} MB/s"


def test_pipeline_native_matches_python():
    """Aligned/stem statistics must match the Python feeder exactly (same
    window set; misaligned pairs differ only by shuffle rng)."""
    from audio_metrics_tpu.parallel.pipeline import embedding_pipeline, ItemCategory
    from audio_metrics_tpu.models import DummyEmbedder

    def mix_func(audio, sr=None):
        return audio.mean(axis=1)

    rng = np.random.default_rng(5)
    sr = 16000
    data = rng.random((17, 5 * sr, 2)).astype(np.float32)

    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        apa_mode="reference",
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=8,
        win_dur=5.0,
        seed=11,
    )
    r_py = embedding_pipeline(data, use_native=False, **kwargs)
    r_nat = embedding_pipeline(data, use_native=True, **kwargs)

    for cat in (ItemCategory.aligned, ItemCategory.stem):
        a, b = r_py[cat], r_nat[cat]
        assert a.n == b.n
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-5)
    # stem embeddings: same set of rows (order may differ)
    ea = np.sort(np.asarray(r_py[ItemCategory.stem].embeddings), axis=0)
    eb = np.sort(np.asarray(r_nat[ItemCategory.stem].embeddings), axis=0)
    np.testing.assert_allclose(ea, eb, rtol=1e-5)
    # misaligned: same count, statistically similar mean
    ma, mb = r_py[ItemCategory.misaligned], r_nat[ItemCategory.misaligned]
    assert ma.n == mb.n


def test_cancel_unblocks_blocked_feeder():
    """cancel() must release a feeder thread parked on the loader's
    backpressure wait (the abandoned-consumer path in _native_batches);
    without it, dropping the batcher while the feeder is inside feed() is a
    native use-after-free."""
    import threading
    import time

    win = 1000
    nb = NativeBatcher(
        batch_size=2, win_len=win, stems_mode=True, max_ready_batches=1
    )
    song = np.zeros(win * 4, np.float32)
    fed = []

    def feeder():
        for i in range(200):  # far beyond the 64-song + ready-queue capacity
            nb.feed(song)
            fed.append(i)
        nb.finish()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    time.sleep(0.3)
    assert t.is_alive(), "feeder should be blocked on backpressure"
    nb.cancel()
    t.join(timeout=10)
    assert not t.is_alive(), "cancel() did not unblock the feeder"
    # iteration after cancel terminates promptly (already-assembled batches
    # may still drain; it must not hang)
    assert len(list(nb)) <= 1 + len(fed)


def test_fuzz_interleavings():
    """Randomized feed/consume/abandon interleavings across modes: no
    deadlocks, no crashes, full batches always shaped right."""
    import threading

    master = np.random.default_rng(1234)
    for trial in range(25):
        rng = np.random.default_rng(master.integers(2**63))
        bs = int(rng.integers(1, 9))
        win = int(rng.integers(40, 300))
        mode, pair_input = rng.choice(
            [(None, False), (None, True), ("reference", True), ("candidate", True)]
        )
        stems = bool(rng.integers(0, 2)) if mode else bool(rng.integers(0, 2))
        nb = NativeBatcher(
            batch_size=bs,
            win_len=win,
            apa_mode=mode,
            stems_mode=stems,
            song_buffer=int(rng.integers(1, 8)),
            win_buffer=int(rng.integers(4, 32)),
            win_min_age=int(rng.integers(0, 4)),
            seed=trial,
            max_ready_batches=int(rng.integers(1, 4)),
        )
        songs = [
            np.asarray(
                rng.normal(size=(ln, 2) if pair_input else (ln,)), np.float32
            )
            for ln in rng.integers(10, 5 * 300, size=int(rng.integers(0, 14)))
        ]
        abandon_after = int(rng.integers(0, 4)) if rng.random() < 0.4 else None

        def feeder():
            for s in songs:
                nb.feed(s)
            nb.finish()

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        consumed = 0
        for kind, audio, cat, valid in nb:
            assert audio.shape[0] == bs
            assert valid.sum() >= 1
            consumed += 1
            if abandon_after is not None and consumed > abandon_after:
                break
        nb.cancel()
        t.join(timeout=10)
        assert not t.is_alive(), f"trial {trial}: feeder wedged"
        del nb


def test_pipeline_native_abandoned_consumer():
    """Breaking out of the pipeline's native batch stream mid-iteration must
    not wedge or crash (exercises the _native_batches finally path)."""
    import gc

    from audio_metrics_tpu.parallel.pipeline import _native_batches

    rng = np.random.default_rng(7)
    songs = [rng.normal(size=4000).astype(np.float32) for _ in range(64)]
    gen = _native_batches(
        iter(songs), batch_size=2, win_len=500, apa_mode=None,
        stems_mode=True, seed=0, song_buffer=4, win_buffer=8, win_min_age=0,
    )
    next(gen)
    gen.close()  # triggers GeneratorExit at the yield -> finally -> cancel
    gc.collect()
