"""LAION-CLAP audio embedder (HTSAT-base tower) in JAX.

Counterpart of reference embedders/clap.py:10-67, which wraps
``laion_clap.CLAP_Module(enable_fusion=False, amodel="HTSAT-base")`` and taps
intermediate projection layers via forward hooks.  Here the forward is an
explicit multi-output jitted program — no hooks, no per-call hook
registration thread-safety worries (reference clap.py:32-34):

    audio (B, n) @48 kHz
      -> repeat-pad / crop to 10 s (laion "repeatpad" / "rand_trunc")
      -> log-mel (1024 fft / 480 hop / 64 slaney mels, dB)   [matmul-DFT]
      -> HTSAT-base swin encoder -> latent (B, 1024)
      -> audio_projection: linear1 -> relu -> linear2 -> l2-normalize

Output selection matches the reference layer taps (clap.py:7):
  layer=None               -> normalized 512-d embedding (default)
  layer="audio_projection.0" -> linear1 output (pre-ReLU), 512-d
  layer="audio_projection.2" -> linear2 output (pre-normalize), 512-d

Checkpoints: ``convert_checkpoint`` accepts HF Clap state dicts or original
LAION ``.pt`` checkpoints (fused-qkv splitting + key renaming).  The same
cached-download mechanism as the reference (utils/get_url.py) resolves the
two published checkpoint URLs when network is available (or a provisioned
copy under $AM_TPU_CKPT_DIR); a missing checkpoint raises unless random
weights are explicitly opted into (allow_random_weights=True).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mel import log_mel_spectrogram
from .base import Embedder, _require_random_weights_optin
from .htsat import HTSAT_BASE, HTSAT_TINY, HTSATConfig, htsat_encode, init_params

__all__ = [
    "LaionCLAP",
    "CLAP",
    "LAION_CLAP_MUSIC_CHECKPOINT_URL",
    "LAION_CLAP_MUSIC_SPEECH_CHECKPOINT_URL",
    "LAION_CLAP_LAYERS",
    "convert_checkpoint",
]

logger = logging.getLogger(__name__)

# Read once at import: this flag selects a branch of a traced program and is
# not part of the jit cache key, so toggling it after the first forward
# would be silently ignored.
_NO_MEL_TILE = bool(os.environ.get("AM_TPU_NO_MEL_TILE"))

# Fused audio->tokens frontend kernel (ops/frontend_fused.py): the whole
# mel -> BN -> interp -> patchify -> patch-embed -> LN chain in one
# pallas_call for the bf16 repeat-pad path.  Same jit-cache caveat.
_NO_FUSED_FRONTEND = bool(
    os.environ.get("AM_TPU_NO_FUSED_FRONTEND") or os.environ.get("AM_TPU_NO_PALLAS")
)

LAION_CLAP_MUSIC_SPEECH_CHECKPOINT_URL = "https://huggingface.co/lukewys/laion_clap/resolve/main/music_speech_audioset_epoch_15_esc_89.98.pt"
LAION_CLAP_MUSIC_CHECKPOINT_URL = "https://huggingface.co/lukewys/laion_clap/resolve/main/music_audioset_epoch_15_esc_90.14.pt"
LAION_CLAP_LAYERS = ["audio_projection.0", "audio_projection.2"]

SAMPLE_RATE = 48000
MAX_SAMPLES = 10 * SAMPLE_RATE  # 480000
_N_FFT = 1024
_HOP = 480
_N_MELS = 64
_FMIN, _FMAX = 50, 14000
PROJECTION_DIM = 512


def clap_mel(audio, compute_dtype=None, center=True, out_affine=None, out_dtype=None):
    """(B, n) @48k -> (B, n//480 + 1, 64) log-mel, laion non-fusion convention.

    ``out_affine``/``out_dtype``: optional per-bin affine epilogue + output
    dtype (ops/mel.log_mel_spectrogram) — the bf16 forward folds the
    encoder's eval-mode BatchNorm here and takes the mel in bf16."""
    return log_mel_spectrogram(
        audio,
        sampling_rate=SAMPLE_RATE,
        frame_length=_N_FFT,
        hop_length=_HOP,
        n_mels=_N_MELS,
        fmin=_FMIN,
        fmax=_FMAX,
        n_fft=_N_FFT,
        center=center,
        power=2.0,
        mel_norm="slaney",
        mel_scale="slaney",
        log_mode="db",
        compute_dtype=compute_dtype,
        out_affine=out_affine,
        out_dtype=out_dtype,
    )


def _can_tile_mel(n: int) -> bool:
    """The repeat-pad mel shortcut applies when laion's repeatpad tiles the
    clip a whole number of times (no zero tail) and the clip length is a
    hop multiple (so mel frames repeat with the clip period)."""
    return (
        n < MAX_SAMPLES
        and MAX_SAMPLES % n == 0
        and n % _HOP == 0
        and n >= _N_FFT
    )


def clap_mel_tiled(audio, compute_dtype=None, out_affine=None, out_dtype=None):
    """Exact log-mel of the repeat-padded clip at ~1/r of the mel cost.

    laion repeatpad tiles an n-sample clip r = MAX_SAMPLES//n times
    (reference laion_clap get_audio_features; embedders/clap.py:39 calls it
    with 5 s windows -> r=2).  Because n is a hop multiple, every mel frame
    whose 1024-sample window lies strictly inside the tiled signal is
    sample-identical to the frame one clip period (p = n/hop frames)
    earlier.  So only the p+2 head frames (left reflect pad + one period)
    and the 2 tail frames (right reflect pad) hit the DFT; the mid frames
    are row copies.  Matches clap_mel(tiled audio) up to matmul
    accumulation-order noise (~1e-5 dB on the 2 tail frames; the rest is
    bitwise in practice — tests/test_models.py), and the 10 s tiled
    waveform never materializes.
    """
    b, n = audio.shape
    p = n // _HOP
    half = _N_FFT // 2  # center-pad width
    n_frames = MAX_SAMPLES // _HOP + 1
    t_tail0 = (MAX_SAMPLES - half) // _HOP + 1  # first frame touching the
    # right reflect pad
    extra = _HOP + half  # samples past one period that frame p+1 reaches
    head_sig = jnp.concatenate(
        [audio[:, 1 : half + 1][:, ::-1], audio, audio[:, :extra]], axis=1
    )
    tail_sig = jnp.concatenate(
        [audio[:, n - extra :], audio[:, -half - 1 : -1][:, ::-1]], axis=1
    )
    # the per-bin affine epilogue commutes exactly with the mid-frame row
    # copies below, so folding it into the head/tail kernels is exact
    head = clap_mel(
        head_sig, compute_dtype=compute_dtype, center=False,
        out_affine=out_affine, out_dtype=out_dtype,
    )
    tail = clap_mel(
        tail_sig, compute_dtype=compute_dtype, center=False,
        out_affine=out_affine, out_dtype=out_dtype,
    )
    mid_idx = 2 + (np.arange(p + 2, t_tail0) - 2) % p
    mel = jnp.concatenate([head, head[:, mid_idx], tail], axis=1)
    assert mel.shape[1] == n_frames
    return mel


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _clap_forward(params: dict, audio, cfg: HTSATConfig, compute_dtype=None):
    """audio (B, n <= MAX_SAMPLES) -> dict of all tap outputs (B, 512).

    Shorter-than-10s audio is repeat-padded on device (shapes are static, so
    the tile+pad traces cleanly) — the host never materializes the padded
    copy and host->device transfers stay at the original clip length.
    """
    n = audio.shape[1]
    bf16 = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    if bf16:
        # fold the encoder's eval-mode BatchNorm (per-mel-bin affine) into
        # the mel epilogue and take the mel in bf16 — the separate BN pass
        # and half the mel HBM round-trip disappear; bitwise-equivalent
        # downstream because the frontend interp matmul consumed the mel in
        # bf16 anyway (reassociation: scale precomputed as rsqrt(var)*gamma)
        bn_s = params["audio_encoder.batch_norm.weight"] * jax.lax.rsqrt(
            params["audio_encoder.batch_norm.running_var"] + 1e-5
        )
        bn_o = (
            params["audio_encoder.batch_norm.bias"]
            - params["audio_encoder.batch_norm.running_mean"] * bn_s
        )
        out_affine, out_dtype = (bn_s, bn_o), jnp.bfloat16
    else:
        out_affine, out_dtype = None, None
    if (
        bf16
        and not _NO_FUSED_FRONTEND
        and not _NO_MEL_TILE
        and jax.default_backend() == "tpu"
    ):
        from ..ops.frontend_fused import clap_tokens_fused, fused_frontend_supported
        from ..ops.mel import mel_filter_bank
        from .htsat import htsat_encode_tokens

        if fused_frontend_supported(n, SAMPLE_RATE, cfg):
            # one kernel: audio -> swin patch tokens (mel, BN, interp,
            # patchify, patch embed, LN all in VMEM; ops/frontend_fused.py)
            fb_np = mel_filter_bank(
                _N_FFT // 2 + 1, _N_MELS, float(_FMIN), float(_FMAX),
                SAMPLE_RATE, norm="slaney", mel_scale="slaney",
            ).astype(np.float32)
            tokens = clap_tokens_fused(
                audio,
                sr=SAMPLE_RATE,
                cfg=cfg,
                fb_matrix=fb_np,
                bn_scale=bn_s,
                bn_offset=bn_o,
                patch_w=params["audio_encoder.patch_embed.proj.weight"]
                .reshape(-1, cfg.patch_size * cfg.patch_size)
                .T,
                patch_b=params["audio_encoder.patch_embed.proj.bias"],
                ln_w=params["audio_encoder.patch_embed.norm.weight"],
                ln_b=params["audio_encoder.patch_embed.norm.bias"],
            )
            latent = htsat_encode_tokens(params, tokens, cfg)
            return _projection_taps(params, latent)
    if _can_tile_mel(n) and not _NO_MEL_TILE:
        # default 5 s windows: exact repeat-pad mel at ~half the cost, and
        # the 10 s tiled waveform never exists in HBM
        mel = clap_mel_tiled(
            audio, compute_dtype=compute_dtype,
            out_affine=out_affine, out_dtype=out_dtype,
        )
    else:
        if n < MAX_SAMPLES:
            n_repeat = MAX_SAMPLES // n
            audio = jnp.tile(audio, (1, n_repeat))
            pad = MAX_SAMPLES - audio.shape[1]
            if pad:
                audio = jnp.pad(audio, ((0, 0), (0, pad)))
        # bf16 compute dispatches the mel chain to the fused Pallas frontend
        # (halo-DMA kernel); f32 compute keeps the exact XLA path
        mel = clap_mel(
            audio, compute_dtype=compute_dtype,
            out_affine=out_affine, out_dtype=out_dtype,
        )
    latent = htsat_encode(
        params, mel, cfg, compute_dtype=compute_dtype, batch_norm_applied=bf16
    )
    return _projection_taps(params, latent)


def _projection_taps(params: dict, latent) -> dict:
    """Pooled latent (B, num_features) -> the three reference tap outputs
    (audio_projection hooks, reference embedders/clap.py:7,32-43)."""
    l1 = (
        jnp.dot(
            latent,
            params["audio_projection.linear1.weight"].T,
            preferred_element_type=jnp.float32,
        )
        + params["audio_projection.linear1.bias"]
    )
    l2 = (
        jnp.dot(
            jax.nn.relu(l1),
            params["audio_projection.linear2.weight"].T,
            preferred_element_type=jnp.float32,
        )
        + params["audio_projection.linear2.bias"]
    )
    normalized = l2 / jnp.linalg.norm(l2, axis=-1, keepdims=True)
    return {
        "embedding": normalized,
        "audio_projection.0": l1,
        "audio_projection.2": l2,
    }


def _repeatpad_np(audio: np.ndarray, max_len: int, rng) -> np.ndarray:
    """laion get_audio_features data handling, batched on host:
    shorter -> tile whole copies then zero-pad; longer -> random crop.

    (The shorter-than-max case is also implemented on device inside
    ``_clap_forward``; this host version handles the rand_trunc crop and
    serves as the spec for tests.)"""
    b, n = audio.shape
    if n == max_len:
        return audio
    if n < max_len:
        n_repeat = max_len // n
        tiled = np.tile(audio, (1, n_repeat))
        pad = max_len - tiled.shape[1]
        if pad:
            tiled = np.pad(tiled, ((0, 0), (0, pad)))
        return tiled
    # rand_trunc
    out = np.empty((b, max_len), dtype=audio.dtype)
    for i in range(b):
        start = rng.integers(0, n - max_len + 1)
        out[i] = audio[i, start : start + max_len]
    return out


class LaionCLAP(Embedder):
    """HTSAT-base CLAP audio embedder; 512-d outputs at three tap points."""

    names = ("embedding", "audio_projection.0", "audio_projection.2")

    def __init__(
        self,
        ckpt: str | None = None,
        layer: str | None = None,
        params: dict | None = None,
        cfg: HTSATConfig = HTSAT_BASE,
        seed: int = 0,
        compute_dtype: str | None = None,
        allow_random_weights: bool = False,
    ):
        """``compute_dtype="bfloat16"`` runs the transformer's matmuls in
        bf16 on the MXU (~2x throughput on v5e) with f32 normalization,
        softmax and pooling; default float32.

        A missing checkpoint RAISES unless ``allow_random_weights=True`` (or
        ``AM_TPU_ALLOW_RANDOM_WEIGHTS=1``): for a metrics library, random
        weights silently produce plausible-looking but meaningless FAD/KD
        numbers (the reference downloads-or-dies, embedders/clap.py:17-18).
        """
        self.layer = layer
        self.cfg = cfg
        self.compute_dtype = (
            jnp.dtype(compute_dtype).type if compute_dtype else None
        )
        self._rng = np.random.default_rng(seed)
        if params is None and ckpt is not None:
            params = _load_params(ckpt, cfg)
        if params is None:
            _require_random_weights_optin("LaionCLAP", ckpt, allow_random_weights)
            params = init_params(cfg, seed=seed)
            params.update(init_projection_params(cfg, seed=seed))
        self.params = jax.tree.map(jnp.asarray, params)

    @property
    def sr(self) -> int:
        return SAMPLE_RATE

    @property
    def embed_fn(self):
        """Pure (B, n<=10s) -> (B, 512) forward for the pipeline's fused
        device-resident loop (repeat-pad happens in-trace; the host-side
        rand_trunc crop only applies to >10 s inputs, which the windowed
        pipeline never produces)."""

        cfg, dt, layer = self.cfg, self.compute_dtype, self.layer or "embedding"

        def fn(params, audio):
            return _clap_forward(params, audio, cfg, dt)[layer]

        return fn

    def forward(self, data: dict) -> dict:
        audio = data["audio"]
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[1] > MAX_SAMPLES:
            # rand_trunc crop happens on host (data-dependent offsets)
            audio = _repeatpad_np(
                np.asarray(audio, dtype=np.float32), MAX_SAMPLES, self._rng
            )
        out = _clap_forward(
            self.params,
            jnp.asarray(audio, dtype=jnp.float32),
            self.cfg,
            self.compute_dtype,
        )
        if self.layer:
            return {"embedding": out[self.layer]}
        return {"embedding": out["embedding"]}


CLAP = LaionCLAP


def init_projection_params(cfg: HTSATConfig = HTSAT_BASE, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed + 1)
    d = cfg.num_features
    return {
        "audio_projection.linear1.weight": rng.normal(
            scale=0.02, size=(PROJECTION_DIM, d)
        ).astype(np.float32),
        "audio_projection.linear1.bias": np.zeros(PROJECTION_DIM, np.float32),
        "audio_projection.linear2.weight": rng.normal(
            scale=0.02, size=(PROJECTION_DIM, PROJECTION_DIM)
        ).astype(np.float32),
        "audio_projection.linear2.bias": np.zeros(PROJECTION_DIM, np.float32),
    }


# ----------------------------------------------------------------------
# checkpoint conversion
# ----------------------------------------------------------------------
# LAION state-dict fragment renames (structural facts of the two formats)
_LAION_RENAMES = [
    ("audio_branch.", "audio_encoder."),
    ("bn0.", "batch_norm."),
    ("attn.qkv.", "attention.qkv."),  # split later
    ("attn.proj.", "attention.output.dense."),
    ("attn.relative_position_bias_table", "attention.self.relative_position_bias_table"),
    ("mlp.fc1.", "intermediate.dense."),
    ("mlp.fc2.", "output.dense."),
    ("norm1.", "layernorm_before."),
    ("norm2.", "layernorm_after."),
    ("audio_projection.0.", "audio_projection.linear1."),
    ("audio_projection.2.", "audio_projection.linear2."),
]

_KEEP_PREFIXES = ("audio_encoder.", "audio_projection.")


def expected_param_keys(cfg: HTSATConfig) -> set:
    """The exact key set the forward consumes for ``cfg``."""
    return set(init_params(cfg, seed=0)) | set(init_projection_params(cfg))


def convert_checkpoint(
    state_dict: dict, cfg: HTSATConfig | None = None, strict: bool = False
) -> dict:
    """Convert a CLAP checkpoint (LAION .pt or HF) to our param dict.

    Handles: 'module.' / 'model.' / 'audio_model.' prefixes, LAION->HF key
    renames, fused qkv splitting.  Text-tower and classifier-head weights are
    dropped (this framework embeds audio only, like the reference's use of
    the model).

    With ``cfg`` the result is filtered to exactly the keys the forward
    consumes (dropping LAION's DSP-frontend weights, buffers like
    relative_position_index, and HTSAT's tscam/classifier head); with
    ``strict`` a checkpoint that does not cover that key set RAISES with the
    missing keys listed — a layout mismatch must fail loudly, not embed
    garbage.  Real checkpoint loads (``_load_params``) use both.
    """
    flat = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        for prefix in ("module.", "model.", "audio_model."):
            if key.startswith(prefix):
                key = key[len(prefix) :]
        for old, new in _LAION_RENAMES:
            key = key.replace(old, new)
        flat[key] = arr.astype(np.float32)

    params = {}
    for key, arr in flat.items():
        if not key.startswith(_KEEP_PREFIXES):
            continue
        if ".attention.qkv." in key:
            # fused qkv -> query / key / value thirds
            d = arr.shape[0] // 3
            for name, chunk in zip(
                ("query", "key", "value"), (arr[:d], arr[d : 2 * d], arr[2 * d :])
            ):
                params[key.replace(".attention.qkv.", f".attention.self.{name}.")] = (
                    chunk
                )
        elif ".attention.self.query." in key or ".attention.self.key." in key or (
            ".attention.self.value." in key
        ):
            params[key] = arr
        else:
            params[key] = arr

    if cfg is not None:
        expected = expected_param_keys(cfg)
        missing = expected - set(params)
        if strict and missing:
            raise ValueError(
                f"CLAP checkpoint conversion incomplete for {cfg}: "
                f"{len(missing)} of {len(expected)} keys missing, e.g. "
                f"{sorted(missing)[:5]} — wrong checkpoint or layout drift"
            )
        params = {k: v for k, v in params.items() if k in expected}
    return params


def _load_params(ckpt: str, cfg: HTSATConfig = HTSAT_BASE) -> dict | None:
    """Resolve a checkpoint URL/path (local dir / cache / download) and
    convert it; None when unreachable (air-gapped host without a
    provisioned copy — see AM_TPU_CKPT_DIR in utils/get_url.py)."""
    from ..utils.get_url import resolve_checkpoint

    path = resolve_checkpoint(ckpt)
    if path is None:
        return None
    if str(path).endswith(".npz"):
        # torch-free deployment format written by
        # ``python -m audio_metrics_tpu convert`` — already in our key
        # layout; still validated against the forward's key set
        params = {k: np.asarray(v) for k, v in np.load(path).items()}
        expected = expected_param_keys(cfg)
        missing = expected - set(params)
        if missing:
            raise ValueError(
                f"npz checkpoint {path} incomplete: {len(missing)} of "
                f"{len(expected)} keys missing, e.g. {sorted(missing)[:5]}"
            )
        return {k: v for k, v in params.items() if k in expected}
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_checkpoint(state, cfg=cfg, strict=True)
