"""End-to-end model tests: CLAP full path vs HF feature-extractor+model,
VGGish vs an inline torch replica of torchvggish, registry behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from audio_metrics_tpu.models.clap import (
    LaionCLAP,
    convert_checkpoint,
    clap_mel,
    _repeatpad_np,
    MAX_SAMPLES,
)
from audio_metrics_tpu.models.htsat import HTSATConfig
from audio_metrics_tpu.models.vggish import (
    VGGish,
    convert_torch_state_dict,
    vggish_log_mel_patches,
    _forward as vggish_forward,
)
from audio_metrics_tpu.models import DummyEmbedder, EMBEDDERS, get_embedder


# ----------------------------------------------------------------------
# CLAP
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def hf_clap():
    from transformers import ClapConfig
    from transformers.models.clap.modeling_clap import ClapModel

    cfg = ClapConfig()
    cfg.audio_config.drop_path_rate = 0.0
    cfg.audio_config.hidden_dropout_prob = 0.0
    cfg.audio_config.attention_probs_dropout_prob = 0.0
    torch.manual_seed(0)
    model = ClapModel(cfg).eval()
    with torch.no_grad():
        model.audio_model.audio_encoder.batch_norm.running_mean.normal_(0, 0.5)
        model.audio_model.audio_encoder.batch_norm.running_var.uniform_(0.5, 2.0)
    return model


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import ClapFeatureExtractor

    # frequency_min/max as in the published laion extractor configs
    return ClapFeatureExtractor(
        truncation="rand_trunc", padding="repeatpad", frequency_min=50, frequency_max=14000
    )


def test_clap_mel_matches_hf_extractor(hf_extractor):
    rng = np.random.default_rng(0)
    audio = (0.3 * rng.normal(size=MAX_SAMPLES)).astype(np.float32)
    want = hf_extractor._np_extract_fbank_features(
        audio, hf_extractor.mel_filters_slaney
    )  # (T, 64)
    got = np.asarray(clap_mel(audio[None]))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-3)


def test_clap_mel_tiled_exact():
    """The repeat-pad mel shortcut must match the mel of the explicitly
    tiled waveform: sample windows are identical, so any difference is
    matmul accumulation-order noise from the different row counts (~1e-5 dB
    on the two tail frames; head/mid frames bitwise on CPU)."""
    from audio_metrics_tpu.models.clap import _can_tile_mel, clap_mel_tiled

    rng = np.random.default_rng(5)
    for n in (MAX_SAMPLES // 2, MAX_SAMPLES // 5):  # 5 s and 2 s clips
        assert _can_tile_mel(n)
        a = (0.3 * rng.normal(size=(2, n))).astype(np.float32)
        r = MAX_SAMPLES // n
        full = np.asarray(clap_mel(np.tile(a, (1, r))))
        fast = np.asarray(clap_mel_tiled(a))
        np.testing.assert_array_equal(fast[:, :-2], full[:, :-2])
        np.testing.assert_allclose(fast[:, -2:], full[:, -2:], rtol=0, atol=1e-4)
    assert not _can_tile_mel(MAX_SAMPLES // 2 + 480)  # doesn't divide 10 s
    assert not _can_tile_mel(MAX_SAMPLES)  # nothing to tile


def test_clap_mel_tiled_exact_halo_kernel():
    """Same bitwise equality through the fused halo Pallas kernel
    (interpret mode) — the kernel must be frame-position invariant."""
    from audio_metrics_tpu.models.clap import _HOP, _N_FFT, _FMIN, _FMAX, _N_MELS
    from audio_metrics_tpu.ops.mel import log_mel_pallas_halo, mel_filter_bank

    rng = np.random.default_rng(6)
    n = MAX_SAMPLES // 2
    a = (0.3 * rng.normal(size=(1, n))).astype(np.float32)
    fb = mel_filter_bank(
        _N_FFT // 2 + 1, _N_MELS, float(_FMIN), float(_FMAX), 48000,
        norm="slaney", mel_scale="slaney", triangle_domain="hz",
    ).astype(np.float32)
    mel = lambda x, center: log_mel_pallas_halo(
        x, frame_length=_N_FFT, hop_length=_HOP, n_fft=_N_FFT, fb=fb,
        center=center, log_mode="db", interpret=True,
    )
    full = mel(np.tile(a, (1, 2)), True)
    half = _N_FFT // 2
    extra = _HOP + half
    head_sig = np.concatenate([a[:, 1 : half + 1][:, ::-1], a, a[:, :extra]], axis=1)
    tail_sig = np.concatenate([a[:, n - extra :], a[:, -half - 1 : -1][:, ::-1]], axis=1)
    head = mel(head_sig, False)
    tail = mel(tail_sig, False)
    p = n // _HOP
    t_tail0 = (MAX_SAMPLES - half) // _HOP + 1
    mid_idx = 2 + (np.arange(p + 2, t_tail0) - 2) % p
    fast = np.concatenate(
        [np.asarray(head), np.asarray(head)[:, mid_idx], np.asarray(tail)], axis=1
    )
    np.testing.assert_array_equal(fast, np.asarray(full))


def test_repeatpad():
    rng = np.random.default_rng(1)
    # 5 s -> tiles exactly twice
    a = rng.normal(size=(2, MAX_SAMPLES // 2)).astype(np.float32)
    out = _repeatpad_np(a, MAX_SAMPLES, rng)
    np.testing.assert_array_equal(out[:, : a.shape[1]], a)
    np.testing.assert_array_equal(out[:, a.shape[1] :], a)
    # non-divisor length -> whole tiles + zero pad
    b = rng.normal(size=(1, 180000)).astype(np.float32)
    out = _repeatpad_np(b, MAX_SAMPLES, rng)
    np.testing.assert_array_equal(out[0, :180000], b[0])
    np.testing.assert_array_equal(out[0, 180000:360000], b[0])
    assert np.all(out[0, 360000:] == 0)
    # longer -> random crop of the right size
    c = rng.normal(size=(1, MAX_SAMPLES + 999)).astype(np.float32)
    out = _repeatpad_np(c, MAX_SAMPLES, rng)
    assert out.shape == (1, MAX_SAMPLES)


def test_clap_full_path_matches_hf(hf_clap, hf_extractor):
    """10 s audio -> our embedder vs HF get_audio_features with identical
    weights (HF-default tiny config)."""
    params = convert_checkpoint(hf_clap.state_dict())
    cfg = HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32))
    emb = LaionCLAP(params=params, cfg=cfg)

    rng = np.random.default_rng(2)
    audio = (0.3 * rng.normal(size=(2, MAX_SAMPLES))).astype(np.float32)

    feats = hf_extractor(
        [a for a in audio], sampling_rate=48000, return_tensors="pt", padding=True
    )
    with torch.no_grad():
        want = hf_clap.get_audio_features(input_features=feats["input_features"]).numpy()

    got = np.asarray(emb.forward({"audio": audio})["embedding"])
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
    # normalized output
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)


def test_clap_taps(hf_clap):
    params = convert_checkpoint(hf_clap.state_dict())
    cfg = HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32))
    rng = np.random.default_rng(3)
    audio = (0.1 * rng.normal(size=(1, MAX_SAMPLES // 2))).astype(np.float32)

    e_def = LaionCLAP(params=params, cfg=cfg)
    e_l1 = LaionCLAP(params=params, cfg=cfg, layer="audio_projection.0")
    e_l2 = LaionCLAP(params=params, cfg=cfg, layer="audio_projection.2")
    out_def = np.asarray(e_def.forward({"audio": audio})["embedding"])
    out_l1 = np.asarray(e_l1.forward({"audio": audio})["embedding"])
    out_l2 = np.asarray(e_l2.forward({"audio": audio})["embedding"])
    assert out_def.shape == out_l1.shape == out_l2.shape == (1, 512)
    # tap 2 is pre-normalization of the default output
    np.testing.assert_allclose(
        out_l2 / np.linalg.norm(out_l2, axis=1, keepdims=True), out_def, rtol=1e-4
    )
    # taps differ from each other
    assert not np.allclose(out_l1, out_l2)


def test_clap_random_init_runs():
    emb = LaionCLAP(allow_random_weights=True)  # random weights, base config
    rng = np.random.default_rng(4)
    audio = rng.normal(size=(2, 240000)).astype(np.float32)
    out = emb.forward({"audio": audio})
    assert out["embedding"].shape == (2, 512)
    assert np.isfinite(np.asarray(out["embedding"])).all()


# ----------------------------------------------------------------------
# VGGish
# ----------------------------------------------------------------------
def _torch_vggish():
    """Inline replica of the torchvggish VGG module (same layer layout)."""
    import torch.nn as nn

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
                nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            )
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.Identity(),
            )

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().flatten(1)
            return self.embeddings(x)

    torch.manual_seed(0)
    return VGG().eval()


def test_vggish_net_matches_torch():
    net = _torch_vggish()
    params = convert_torch_state_dict(net.state_dict())
    rng = np.random.default_rng(5)
    patches = rng.normal(size=(4, 96, 64)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(patches)[:, None]).numpy()
    got = np.asarray(vggish_forward({k: np.asarray(v) for k, v in params.items()}, patches))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def _numpy_vggish_mel(audio, sr=16000):
    """Direct numpy port of the torchvggish mel_features math (spec)."""
    win, hop, n_fft = 400, 160, 512
    n_frames = 1 + (len(audio) - win) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = audio[idx]
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    spec = np.abs(np.fft.rfft(frames * window, n_fft))
    # HTK mel, triangles in mel domain, DC bin zeroed
    def h2m(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    spec_mel = h2m(freqs)
    edges = np.linspace(h2m(125.0), h2m(7500.0), 66)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    up_slope = (spec_mel[:, None] - lower) / (center - lower)
    down_slope = (upper - spec_mel[:, None]) / (upper - center)
    weights = np.maximum(0, np.minimum(up_slope, down_slope))
    weights[0] = 0
    return np.log(spec @ weights + 0.01)


def test_vggish_mel_matches_spec():
    rng = np.random.default_rng(6)
    audio = (0.5 * rng.normal(size=5 * 16000)).astype(np.float32)
    want = _numpy_vggish_mel(audio.astype(np.float64))
    got = np.asarray(vggish_log_mel_patches(audio[None]))[0]
    n_patches = want.shape[0] // 96
    want = want[: n_patches * 96].reshape(n_patches, 96, 64)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_vggish_embedder_interface():
    emb = VGGish(allow_random_weights=True)
    rng = np.random.default_rng(7)
    audio = rng.normal(size=(3, 5 * 16000)).astype(np.float32)
    out = emb.forward({"audio": audio})
    assert out["embedding"].shape == (3, 128)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    assert emb.sr == 16000


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------
def test_registry_names():
    assert set(EMBEDDERS) == {
        "laion_clap_music",
        "laion_clap_music_l-2",
        "laion_clap_music_l-1",
        "laion_clap_music_speech",
        "laion_clap_music_speech_l-2",
        "laion_clap_music_speech_l-1",
        "vggish",
        "dummy",
    }
    d = get_embedder("dummy")
    assert isinstance(d, DummyEmbedder)
    with pytest.raises(ValueError):
        get_embedder("nope")


def test_clap_bf16_close_to_f32():
    from audio_metrics_tpu.models.htsat import HTSAT_TINY
    import audio_metrics_tpu.models.clap as clap_mod

    params = None
    rng = np.random.default_rng(8)
    audio = (0.2 * rng.normal(size=(2, clap_mod.MAX_SAMPLES // 2))).astype(np.float32)
    e32 = clap_mod.LaionCLAP(cfg=HTSAT_TINY, seed=3, allow_random_weights=True)
    e16 = clap_mod.LaionCLAP(cfg=HTSAT_TINY, seed=3, compute_dtype="bfloat16", allow_random_weights=True)
    o32 = np.asarray(e32.forward({"audio": audio})["embedding"])
    o16 = np.asarray(e16.forward({"audio": audio})["embedding"])
    # both normalized; cosine similarity must be very high
    cos = np.sum(o32 * o16, axis=1)
    assert np.all(cos > 0.995), cos


def test_clap_bf16_bn_fold_matches_unfolded():
    """The bf16 forward folds the eval-mode BatchNorm into the mel epilogue
    (models/clap._clap_forward); with NONTRIVIAL BN stats the folded mel must
    match the in-encoder BN applied to the plain mel, and the end-to-end
    embedding must stay close to the f32 (unfolded) forward."""
    import jax.numpy as jnp

    from audio_metrics_tpu.models.htsat import HTSAT_TINY, init_params
    import audio_metrics_tpu.models.clap as clap_mod

    rng = np.random.default_rng(11)
    params = init_params(HTSAT_TINY, seed=3)
    params.update(clap_mod.init_projection_params(HTSAT_TINY, seed=3))
    params["audio_encoder.batch_norm.running_mean"] = rng.normal(
        scale=2.0, size=64
    ).astype(np.float32)
    params["audio_encoder.batch_norm.running_var"] = (
        0.5 + rng.random(64).astype(np.float32) * 3.0
    )
    params["audio_encoder.batch_norm.weight"] = (
        1.0 + 0.3 * rng.normal(size=64)
    ).astype(np.float32)
    params["audio_encoder.batch_norm.bias"] = rng.normal(size=64).astype(
        np.float32
    )
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    audio = (0.2 * rng.normal(size=(2, clap_mod.MAX_SAMPLES // 2))).astype(
        np.float32
    )

    # mel-level: folded epilogue == explicit BN over the plain mel
    s = params["audio_encoder.batch_norm.weight"] / np.sqrt(
        params["audio_encoder.batch_norm.running_var"] + 1e-5
    )
    o = (
        params["audio_encoder.batch_norm.bias"]
        - params["audio_encoder.batch_norm.running_mean"] * s
    )
    folded = clap_mod.clap_mel_tiled(
        jnp.asarray(audio), compute_dtype=jnp.bfloat16,
        out_affine=(jnp.asarray(s), jnp.asarray(o)), out_dtype=jnp.bfloat16,
    )
    plain = clap_mod.clap_mel_tiled(jnp.asarray(audio), compute_dtype=jnp.bfloat16)
    want = np.asarray(plain) * s + o
    np.testing.assert_allclose(
        np.asarray(folded, np.float32), want.astype(jnp.bfloat16).astype(np.float32),
        rtol=0, atol=0.5,
    )

    # end-to-end: bf16 (folded) vs f32 (unfolded) embeddings
    o32 = np.asarray(
        clap_mod._clap_forward(jparams, jnp.asarray(audio), HTSAT_TINY, None)[
            "embedding"
        ]
    )
    o16 = np.asarray(
        clap_mod._clap_forward(
            jparams, jnp.asarray(audio), HTSAT_TINY, jnp.bfloat16
        )["embedding"]
    )
    cos = np.sum(o32 * o16, axis=1)
    assert np.all(cos > 0.995), cos


def test_laion_checkpoint_load_end_to_end(tmp_path, hf_clap, monkeypatch):
    """Fabricate a LAION-format .pt checkpoint (module.-prefixed, fused qkv)
    from the HF oracle's weights and load it through the ckpt plumbing."""
    from audio_metrics_tpu.models.clap import _load_params

    sd = hf_clap.state_dict()
    laion_sd = {}
    for k, v in sd.items():
        if k.startswith("text_model"):
            continue
        k = k.replace("audio_model.audio_encoder.", "audio_branch.")
        k = k.replace("batch_norm.", "bn0.")
        k = k.replace("layernorm_before.", "norm1.")
        k = k.replace("layernorm_after.", "norm2.")
        k = k.replace("intermediate.dense.", "mlp.fc1.")
        k = k.replace("output.dense.", "mlp.fc2.") if ".attention." not in k else k
        k = k.replace("attention.output.dense.", "attn.proj.")
        k = k.replace(
            "attention.self.relative_position_bias_table",
            "attn.relative_position_bias_table",
        )
        k = k.replace("audio_projection.linear1.", "audio_projection.0.")
        k = k.replace("audio_projection.linear2.", "audio_projection.2.")
        laion_sd["module." + k] = v
    # fuse q/k/v back into qkv like LAION checkpoints
    fused = {}
    drop = set()
    for k in list(laion_sd):
        if ".attention.self.query." in k:
            base = k.replace(".attention.self.query.", ".attn.qkv.")
            kk = k.replace("query", "key")
            kv = k.replace("query", "value")
            fused[base] = torch.cat([laion_sd[k], laion_sd[kk], laion_sd[kv]], dim=0)
            drop.update({k, kk, kv})
    for k in drop:
        del laion_sd[k]
    laion_sd.update(fused)

    fp = tmp_path / "laion_ckpt.pt"
    torch.save(laion_sd, fp)

    cfg = HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32))
    params = _load_params(str(fp), cfg)  # strict: must fully cover cfg
    assert params is not None
    base = "audio_encoder.layers.0.blocks.0"
    assert f"{base}.attention.self.query.weight" in params
    assert "audio_projection.linear1.weight" in params

    # loaded params give the same embedding as direct HF conversion
    rng = np.random.default_rng(9)
    audio = (0.1 * rng.normal(size=(1, MAX_SAMPLES // 2))).astype(np.float32)
    direct = LaionCLAP(params=convert_checkpoint(sd), cfg=cfg)
    via_ckpt = LaionCLAP(params=params, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(direct.forward({"audio": audio})["embedding"]),
        np.asarray(via_ckpt.forward({"audio": audio})["embedding"]),
        rtol=1e-5,
        atol=1e-6,
    )
