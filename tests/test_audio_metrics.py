"""API-level integration tests.

Model of reference tests/test_audio_metrics.py: the full
add_reference/evaluate flow over the input-format matrix with a deterministic
DummyEmbedder, plus the stem-with-APA error case and serialization
round-trip.  Runs fully on the CPU backend (the reference suite requires a
CUDA device even with its dummy embedder — fixed here by design).
"""

import numpy as np
import pytest
import torch

from audio_metrics_tpu import AudioMetrics
from audio_metrics_tpu.models import DummyEmbedder


def mix_func(audio, sr=None):
    # reference-style per-item callable: (n_samples, 2) -> (n_samples,)
    return audio.mean(axis=1)


@pytest.fixture
def am():
    return AudioMetrics(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad", "apa"],
        n_pca=10,
    )


@pytest.fixture
def am_no_apa():
    return AudioMetrics(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad"],
        n_pca=10,
    )


SR = 16000
N_SECONDS = 5


def test_inputs_stacked_ndarray(am):
    rng = np.random.default_rng(0)
    reference = rng.random((20, N_SECONDS * SR, 2))
    candidate = rng.random((20, N_SECONDS * SR, 2))
    am.reset_reference()
    am.add_reference(reference)
    result = am.evaluate(candidate)
    assert set(result) == {"fad", "apa"}
    assert np.isfinite(result["fad"])
    assert 0.0 <= result["apa"] <= 1.0


def test_inputs_generator_and_list(am):
    rng = np.random.default_rng(1)
    reference = (rng.random((N_SECONDS * SR, 2)) for _ in range(20))
    candidate = [rng.random((N_SECONDS * SR, 2)) for _ in range(20)]
    am.reset_reference()
    am.add_reference(reference)
    result = am.evaluate(candidate)
    assert np.isfinite(result["fad"])


def test_inputs_torch_tensor(am):
    reference = torch.randn((20, N_SECONDS * SR, 2))
    candidate = torch.randn((20, N_SECONDS * SR, 2))
    am.reset_reference()
    am.add_reference(reference)
    result = am.evaluate(candidate)
    assert np.isfinite(result["fad"])


def test_inputs_stems_only(am_no_apa):
    rng = np.random.default_rng(2)
    reference = rng.random((20, N_SECONDS * SR))
    candidate = rng.random((20, N_SECONDS * SR))
    am_no_apa.reset_reference()
    am_no_apa.add_reference(reference)
    result = am_no_apa.evaluate(candidate)
    assert set(result) == {"fad"}


def test_stems_with_apa_raises(am):
    rng = np.random.default_rng(3)
    reference = rng.random((20, N_SECONDS * SR))
    am.reset_reference()
    with pytest.raises(ValueError):
        am.add_reference(reference)


def test_all_metrics():
    am = AudioMetrics(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad", "kd", "prdc", "apa"],
        n_pca=None,
    )
    rng = np.random.default_rng(4)
    reference = rng.random((30, N_SECONDS * SR, 2))
    candidate = rng.random((30, N_SECONDS * SR, 2))
    am.add_reference(reference)
    result = am.evaluate(candidate)
    expected = {
        "fad",
        "kernel_distance_mean",
        "kernel_distance_std",
        "precision",
        "recall",
        "density",
        "coverage",
        "apa",
    }
    assert set(result) == expected
    for v in result.values():
        assert np.isfinite(v)


def test_evaluate_without_reference_raises(am):
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError):
        am.evaluate(rng.random((5, N_SECONDS * SR, 2)))


def test_short_audio_yields_empty_reference(am_no_apa):
    # audio shorter than win_dur produces no windows -> empty reference
    rng = np.random.default_rng(6)
    am_no_apa.add_reference(rng.random((3, SR)))  # 1 s < 5 s
    with pytest.raises(ValueError):
        am_no_apa.evaluate(rng.random((3, N_SECONDS * SR)))


def test_incremental_reference(am_no_apa):
    rng = np.random.default_rng(7)
    c1 = rng.random((10, N_SECONDS * SR))
    c2 = rng.random((10, N_SECONDS * SR))
    cand = rng.random((10, N_SECONDS * SR))

    am_no_apa.add_reference(c1)
    am_no_apa.add_reference(c2)
    r_incr = am_no_apa.evaluate(cand)

    am2 = AudioMetrics(
        embedder=DummyEmbedder(), mix_function=mix_func, metrics=["fad"], n_pca=10
    )
    am2.add_reference(np.concatenate([c1, c2]))
    r_single = am2.evaluate(cand)
    np.testing.assert_allclose(r_incr["fad"], r_single["fad"], rtol=1e-5, atol=1e-7)


def test_serialization(tmp_path):
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad", "apa"],
        n_pca=10,
    )
    am = AudioMetrics(**kwargs)
    rng = np.random.default_rng(8)
    reference = (rng.random((N_SECONDS * SR, 2)) for _ in range(20))
    candidate = [rng.random((N_SECONDS * SR, 2)) for _ in range(20)]
    am.add_reference(reference)
    result1 = am.evaluate(candidate)

    fp = tmp_path / "state.npz"
    am.save_state(fp)

    am = AudioMetrics(**kwargs)
    am.load_state(fp)
    result2 = am.evaluate(candidate)

    assert len(result1) == len(result2)
    for k, v1 in result1.items():
        assert v1 == pytest.approx(result2[k], rel=1e-6, abs=1e-6)


def test_unknown_registry_names():
    with pytest.raises(ValueError):
        AudioMetrics(embedder="nope", mix_function=mix_func)
    with pytest.raises(ValueError):
        AudioMetrics(embedder=DummyEmbedder(), mix_function="nope")


def test_serialization_with_embeddings_metrics(tmp_path):
    # kd/prdc persist raw embeddings + cached radii through save/load
    kwargs = dict(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad", "kd", "prdc"],
    )
    am = AudioMetrics(**kwargs)
    rng = np.random.default_rng(20)
    am.add_reference(rng.random((25, N_SECONDS * SR)))
    cand = rng.random((25, N_SECONDS * SR))
    r1 = am.evaluate(cand)

    fp = tmp_path / "state.npz"
    am.save_state(fp)
    am2 = AudioMetrics(**kwargs)
    am2.load_state(fp)
    r2 = am2.evaluate(cand)
    for k, v in r1.items():
        assert v == pytest.approx(r2[k], rel=1e-6, abs=1e-6)


def test_repeated_evaluate_is_deterministic(am_no_apa):
    rng = np.random.default_rng(21)
    am_no_apa.add_reference(rng.random((15, N_SECONDS * SR)))
    cand = rng.random((15, N_SECONDS * SR))
    r1 = am_no_apa.evaluate(cand)
    r2 = am_no_apa.evaluate(cand)  # PCA cache path on the second call
    assert r1 == r2


def test_custom_win_dur():
    # 2.5 s windows: a 6 s clip yields 2 windows (trailing second dropped)
    am = AudioMetrics(
        embedder=DummyEmbedder(),
        mix_function=mix_func,
        metrics=["fad"],
        win_dur=2.5,
    )
    rng = np.random.default_rng(30)
    am.add_reference(rng.random((9, 6 * SR)))
    assert am.stem_reference.n == 18
    out = am.evaluate(rng.random((9, 6 * SR)))
    assert np.isfinite(out["fad"])


def test_lazy_tail_flush_order_equivalent(monkeypatch):
    """AM_TPU_LAZY_TAIL=1 defers the candidate moment pull into the FAD
    thread; results must equal the default (eager-flush) order exactly."""
    import jax.numpy as jnp

    import audio_metrics_tpu.audio_metrics as am_mod

    rng = np.random.default_rng(0)
    sr = 16000
    ref = jnp.asarray(0.2 * rng.normal(size=(24, 5 * sr)).astype(np.float32))
    cand = jnp.asarray(0.2 * rng.normal(size=(24, 5 * sr)).astype(np.float32))

    results = {}
    for lazy in (False, True):
        monkeypatch.setattr(am_mod, "_LAZY_TAIL", lazy)
        am = AudioMetrics(
            embedder=DummyEmbedder(),
            mix_function=mix_func,
            metrics=["fad", "kd", "prdc"],
            win_dur=5.0,
            input_sr=sr,
            batch_size=8,
        )
        am.add_reference(ref)
        results[lazy] = am.evaluate(cand)
    assert results[False].keys() == results[True].keys()
    for k in results[False]:
        np.testing.assert_array_equal(results[False][k], results[True][k]), k


def test_precompile_preserves_state():
    """precompile() warms every program shape on synthetic audio and must
    leave the instance's reference state untouched."""
    import numpy as np

    from audio_metrics_tpu import AudioMetrics
    from audio_metrics_tpu.models import DummyEmbedder

    sr = 16000
    rng = np.random.default_rng(11)
    data = (0.3 * rng.normal(size=(8, 5 * sr))).astype(np.float32)
    am = AudioMetrics(
        metrics=["fad", "kd", "prdc"],
        embedder=DummyEmbedder(),
        win_dur=5.0,
        input_sr=sr,
        batch_size=4,
    )
    am.add_reference(data)
    before = am.evaluate(data)
    am.precompile(n_items=8)
    assert am.stem_reference.n == 8  # state restored, not replaced
    after = am.evaluate(data)
    for k in before:
        assert abs(before[k] - after[k]) < 1e-9, k

    # precompile on a fresh instance leaves the reference empty
    am2 = AudioMetrics(
        metrics=["fad"], embedder=DummyEmbedder(), win_dur=5.0, input_sr=sr
    )
    am2.precompile(n_items=4)
    import pytest

    with pytest.raises(ValueError):
        am2.assert_reference()
