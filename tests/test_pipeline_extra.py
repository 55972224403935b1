"""Pipeline extras: int16 transfer mode, progress-free operation."""

import os

import numpy as np

from audio_metrics_tpu.parallel.pipeline import embedding_pipeline, ItemCategory
from audio_metrics_tpu.models import DummyEmbedder


def mix_func(audio, sr=None):
    return audio.mean(axis=1)


def test_int16_transfer_close_to_f32(monkeypatch):
    rng = np.random.default_rng(0)
    data = (0.5 * rng.normal(size=(12, 5 * 16000))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=False,
        batch_size=8,
    )
    r32 = embedding_pipeline(data, **kwargs)

    monkeypatch.setenv("AM_TPU_TRANSFER_INT16", "1")
    r16 = embedding_pipeline(data, **kwargs)

    a, b = r32[ItemCategory.stem], r16[ItemCategory.stem]
    assert a.n == b.n
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-2, atol=1e-3)


def test_device_resident_input_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    sr = 16000
    data = (0.4 * rng.normal(size=(13, 5 * sr))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=8,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    a, b = r_host[ItemCategory.stem], r_dev[ItemCategory.stem]
    assert a.n == b.n == 13
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)


def test_device_resident_multiwindow_items():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    sr = 16000
    # 11 songs x 12.5 s -> 2 windows each (trailing half dropped)
    data = (0.4 * rng.normal(size=(11, int(12.5 * sr)))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=False,
        batch_size=16,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    assert r_host[ItemCategory.stem].n == r_dev[ItemCategory.stem].n == 22
    np.testing.assert_allclose(
        r_host[ItemCategory.stem].mean, r_dev[ItemCategory.stem].mean, rtol=1e-6
    )

def test_device_resident_without_embed_fn_falls_back():
    """Embedders without a pure embed_fn must still work with device-resident
    inputs (per-batch path instead of the fused loop)."""
    import jax.numpy as jnp
    from audio_metrics_tpu.models.dummy import _dummy_embed

    class HostDummy(DummyEmbedder):
        @property
        def embed_fn(self):
            return None

    rng = np.random.default_rng(3)
    data = (0.4 * rng.normal(size=(9, 5 * 16000))).astype(np.float32)
    kwargs = dict(
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=4,
    )
    r_fused = embedding_pipeline(jnp.asarray(data), embedder=DummyEmbedder(), **kwargs)
    r_plain = embedding_pipeline(jnp.asarray(data), embedder=HostDummy(), **kwargs)
    a, b = r_fused[ItemCategory.stem], r_plain[ItemCategory.stem]
    assert a.n == b.n == 9
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)
    np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-7)

def test_hop_dur_overlapping_windows():
    """hop_dur < win_dur yields overlapping windows, identical between the
    host slicer path and the device-resident path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    sr = 16000
    # 10 s items, 5 s windows, 2.5 s hop -> 3 windows per item
    data = (0.4 * rng.normal(size=(5, 10 * sr))).astype(np.float32)
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=8,
        win_dur=5.0,
        hop_dur=2.5,
    )
    r_host = embedding_pipeline(data, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)
    a, b = r_host[ItemCategory.stem], r_dev[ItemCategory.stem]
    assert a.n == b.n == 15
    np.testing.assert_allclose(a.embeddings, b.embeddings, rtol=1e-6)


def test_hop_dur_through_audio_metrics():
    from audio_metrics_tpu import AudioMetrics

    rng = np.random.default_rng(5)
    sr = 16000
    data = (0.4 * rng.normal(size=(6, 10 * sr))).astype(np.float32)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=DummyEmbedder(),
        win_dur=5.0,
        hop_dur=2.5,
        input_sr=sr,
    )
    am.add_reference(data)
    assert am.stem_reference.n == 18  # 3 windows per 10 s item
    res = am.evaluate(data)
    assert res["fad"] < 1e-8 and res["coverage"] == 1.0
    # state round-trip carries hop_dur
    am.save_state("/tmp/hop_state.npz")
    am2 = AudioMetrics(metrics=["fad"], embedder=DummyEmbedder(), input_sr=sr)
    am2.load_state("/tmp/hop_state.npz")
    assert am2.hop_dur == 2.5


def test_device_resident_pairs_match_host_feeder():
    """The device-resident APA pair path must reproduce the Python feeder's
    aligned/stem statistics exactly (same windows, same batched mix);
    misaligned differs only by shuffle rng (permutation vs reservoir)."""
    import jax.numpy as jnp

    from audio_metrics_tpu.models import DummyEmbedder
    from audio_metrics_tpu.ops.mix import MIX_FUNCTIONS
    from audio_metrics_tpu.parallel.pipeline import ItemCategory, embedding_pipeline

    rng = np.random.default_rng(3)
    sr = 16000
    data = (0.3 * rng.normal(size=(9, 5 * sr, 2))).astype(np.float32)

    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=MIX_FUNCTIONS["PP"],
        apa_mode="reference",
        stems_mode=True,
        store_mix_embeddings=True,
        store_stem_embeddings=True,
        batch_size=4,
        win_dur=5.0,
        seed=7,
    )
    r_host = embedding_pipeline(data, use_native=False, **kwargs)
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)

    for cat in (ItemCategory.aligned, ItemCategory.stem):
        a, b = r_host[cat], r_dev[cat]
        assert a.n == b.n
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-5)
    ea = np.sort(np.asarray(r_host[ItemCategory.stem].embeddings), axis=0)
    eb = np.sort(np.asarray(r_dev[ItemCategory.stem].embeddings), axis=0)
    np.testing.assert_allclose(ea, eb, rtol=1e-5, atol=1e-5)
    ma, mb = r_host[ItemCategory.misaligned], r_dev[ItemCategory.misaligned]
    assert ma.n == mb.n
    # candidate mode: no misaligned category, aligned still matches
    kw2 = dict(kwargs, apa_mode="candidate", store_mix_embeddings=False)
    c_host = embedding_pipeline(data, use_native=False, **kw2)
    c_dev = embedding_pipeline(jnp.asarray(data), **kw2)
    assert ItemCategory.misaligned not in c_dev
    np.testing.assert_allclose(
        c_host[ItemCategory.aligned].mean, c_dev[ItemCategory.aligned].mean,
        rtol=1e-5, atol=1e-5,
    )


def test_device_resident_pairs_callable_mix_matches_host_feeder():
    """A user-callable mix (reference protocol f(audio[n,2], sr) -> mono)
    also takes the device-resident pair path: the mix itself runs on host
    per chunk but windowing/embedding stay fused on device.  Aligned/stem
    stats must match the streaming feeder exactly."""
    import jax.numpy as jnp

    from audio_metrics_tpu.models import DummyEmbedder
    from audio_metrics_tpu.parallel.pipeline import ItemCategory, embedding_pipeline

    calls = []

    def my_mix(audio, sr):
        calls.append(np.asarray(audio).shape)
        return np.asarray(audio).mean(axis=1)

    rng = np.random.default_rng(5)
    sr = 16000
    data = (0.3 * rng.normal(size=(7, 5 * sr, 2))).astype(np.float32)

    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=my_mix,
        apa_mode="reference",
        stems_mode=True,
        store_stem_embeddings=True,
        batch_size=4,
        win_dur=5.0,
        seed=7,
    )
    r_host = embedding_pipeline(data, use_native=False, **kwargs)
    n_host_calls = len(calls)
    assert n_host_calls  # the callable really ran
    r_dev = embedding_pipeline(jnp.asarray(data), **kwargs)

    for cat in (ItemCategory.aligned, ItemCategory.stem):
        a, b = r_host[cat], r_dev[cat]
        assert a.n == b.n
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a.cov, b.cov, rtol=1e-4, atol=1e-5)
    assert r_host[ItemCategory.misaligned].n == r_dev[ItemCategory.misaligned].n


def test_device_resident_pairs_apa_end_to_end():
    """Full AudioMetrics APA flow with device-resident pair arrays."""
    import jax.numpy as jnp

    from audio_metrics_tpu import AudioMetrics

    rng = np.random.default_rng(0)
    sr = 16000

    def pairs(n, corr):
        out = []
        for _ in range(n):
            a = rng.uniform(0.05, 0.5)
            b = a if corr else rng.uniform(0.05, 0.5)
            out.append(
                np.stack(
                    [a * rng.normal(size=5 * sr), b * rng.normal(size=5 * sr)], 1
                )
            )
        return jnp.asarray(np.stack(out).astype(np.float32))

    am = AudioMetrics(
        metrics=["apa"], embedder="dummy", mix_function="PP",
        win_dur=5.0, input_sr=sr,
    )
    am.add_reference(pairs(24, True))
    good = am.evaluate(pairs(24, True))
    bad = am.evaluate(pairs(24, False))
    assert good["apa"] > bad["apa"]


def test_fused_loop_f32_carry_adversarial_scale():
    """Pin the f32 in-carry Chan-merge error bound at adversarial scale
    (VERDICT r1 weak #7): large N, |mean| >> std.  The centered-M2 carry
    must hold ~1e-5 relative covariance error where a raw x^T x
    accumulation would lose ~all significant digits."""
    import jax.numpy as jnp
    from audio_metrics_tpu.parallel.pipeline import _run_fused_embed

    class OffsetEmbedder(DummyEmbedder):
        """Dummy embeddings shifted by a large constant: |mean|/std ~ 1e4."""

        def embed_fn(self_inner):
            base = DummyEmbedder.embed_fn.fget(self_inner)

            def fn(params, audio):
                return base(params, audio) + 1e4

            return fn

        embed_fn = property(embed_fn)

    rng = np.random.default_rng(3)
    n = 4096  # 256 batches of 16: long carry chain
    w = jnp.asarray(rng.normal(size=(n, 500)).astype(np.float32))
    emb = OffsetEmbedder()
    buf, triples = _run_fused_embed(emb, w, n, batch_size=16, mesh=None)
    (nn, s1, m2) = triples[0]

    # f64 host oracle over the same embeddings
    e = np.asarray(buf)[:n].astype(np.float64)
    mean_ref = e.mean(axis=0)
    cov_ref = np.cov(e, rowvar=False)
    mean_got = np.asarray(s1, np.float64) / n
    cov_got = np.asarray(m2, np.float64) / (n - 1)

    assert int(round(float(nn))) == n
    np.testing.assert_allclose(mean_got, mean_ref, rtol=1e-6)
    # covariance: relative to the covariance SCALE (std^2), not the huge mean
    scale = np.abs(cov_ref).max()
    assert scale > 0
    err = np.abs(cov_got - cov_ref).max() / scale
    assert err < 5e-4, err
    # sanity: the naive raw-moment route loses catastrophically here
    raw = (e.astype(np.float32).T @ e.astype(np.float32)).astype(np.float64)
    naive_cov = (raw - n * np.outer(mean_ref, mean_ref)) / (n - 1)
    naive_err = np.abs(naive_cov - cov_ref).max() / scale
    assert naive_err > err * 10, (naive_err, err)


def test_staged_device_put_matches_direct(monkeypatch):
    """Large host batches upload in bounded row slices (remote-device relays
    wedge on single >~100 MB transfers); the staged result must be
    elementwise identical to a direct put."""
    from audio_metrics_tpu.parallel import pipeline as pl

    rng = np.random.default_rng(0)
    a = rng.standard_normal((10, 257)).astype(np.float32)
    monkeypatch.setattr(pl, "_STAGE_ROWS", 3)
    monkeypatch.setattr(pl, "_STAGE_BYTES", 100)  # force the staged path
    out = pl._staged_device_put(a)
    np.testing.assert_array_equal(np.asarray(out), a)
    # small inputs take the direct path regardless of row count
    monkeypatch.setattr(pl, "_STAGE_BYTES", 1 << 30)
    out2 = pl._staged_device_put(a)
    np.testing.assert_array_equal(np.asarray(out2), a)


def test_device_pad_matches_host_pad():
    """A partial final batch uploads real rows only and is zero-padded to
    the program shape on device (the round-4 host-side padding uploaded 4x
    the bytes through the relay, BASELINE.md round-5 row); results must be
    bitwise identical either way — pad rows are masked by ``valid`` in
    every consumer."""
    from audio_metrics_tpu.models import get_embedder
    from audio_metrics_tpu.parallel import pipeline as pl

    rng = np.random.default_rng(7)
    stems = [rng.standard_normal(16000).astype(np.float32) for _ in range(5)]
    emb = get_embedder("dummy")

    def run(pad_host):
        orig = pl._bucketed_batches

        def forced(items, batch_size, **_kw):
            return orig(items, batch_size, pad_host=pad_host)

        pl._bucketed_batches = forced
        try:
            out = pl.embedding_pipeline(
                [np.array(s) for s in stems],
                emb,
                lambda a, sr: a,
                stems_mode=True,
                store_stem_embeddings=True,
                batch_size=4,  # 5 stems -> one full + one partial batch
                win_dur=1.0,
                input_sr=16000,
            )
        finally:
            pl._bucketed_batches = orig
        amd = out[pl.ItemCategory.stem]
        return np.asarray(amd.embeddings), np.asarray(amd.mean)

    e_dev, m_dev = run(pad_host=False)
    e_host, m_host = run(pad_host=True)
    assert e_dev.shape[0] == 5
    np.testing.assert_array_equal(e_dev, e_host)
    np.testing.assert_array_equal(m_dev, m_host)


def test_fused_embed_oom_retry(monkeypatch):
    """HBM exhaustion in the fused loop halves the batch and retries
    (elastic degradation instead of a failed evaluate); unrelated errors
    propagate unchanged."""
    import jax.numpy as jnp

    from audio_metrics_tpu.models import get_embedder
    from audio_metrics_tpu.parallel import pipeline as pl

    emb = get_embedder("dummy")
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((10, 16000)), jnp.float32
    )

    real_get = pl._get_fused_embed_loop
    used = []

    def flaky_get(embedder, batch_size):
        loop = real_get(embedder, batch_size)

        def wrapper(params, wp, nv):
            used.append(batch_size)
            if batch_size > 128:
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
            return loop(params, wp, nv)

        return wrapper

    monkeypatch.setattr(pl, "_get_fused_embed_loop", flaky_get)
    buf, triples = pl._run_fused_embed(emb, w, 10, batch_size=512, mesh=None)
    assert used == [512, 256, 128]
    assert buf.shape[0] >= 10
    (n, s1, m2) = triples[0]
    assert int(n) == 10

    # non-OOM errors propagate
    def broken_get(embedder, batch_size):
        def wrapper(params, wp, nv):
            raise RuntimeError("something else entirely")

        return wrapper

    monkeypatch.setattr(pl, "_get_fused_embed_loop", broken_get)
    try:
        pl._run_fused_embed(emb, w, 10, batch_size=512, mesh=None)
    except RuntimeError as exc:
        assert "something else" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected RuntimeError")
