"""VGGish embedder in JAX.

Counterpart of reference src/audio_metrics/embedders/vggish.py:5-33, which
wraps ``torch.hub.load("harritaylor/torchvggish")`` with pre/postprocessing
disabled and the final ReLU replaced by Identity, returning pre-activation
128-d features averaged over 0.96 s patches.

Architecture (torchvggish VGG):
  features: [Conv64, MP, Conv128, MP, Conv256 x2, MP, Conv512 x2, MP]
  (3x3 convs pad 1, ReLU; 2x2 maxpool stride 2)
  embeddings: Linear(12288, 4096) ReLU Linear(4096, 4096) ReLU
              Linear(4096, 128) [final ReLU removed, vggish.py:12]

Frontend (torchvggish mel_features): 16 kHz mono -> magnitude STFT
(25 ms / 10 ms hann, n_fft 512, no centering) -> 64 HTK mel bands
125-7500 Hz (mel-domain triangles, DC bin zeroed) -> log(mel + 0.01) ->
non-overlapping 96-frame patches.  All of it runs on device via matmul-DFT
(ops/mel.py), batched over the whole window batch, unlike the reference's
per-item host preprocessing (vggish.py:27-31).

Weights: ``convert_torch_state_dict`` maps the torchvggish checkpoint,
resolved like the reference's torch.hub download (URL below) via the local
cache / $AM_TPU_CKPT_DIR.  A missing checkpoint raises unless random
weights are explicitly opted into (allow_random_weights=True) — random
embeddings give meaningless metric values.
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mel import log_mel_spectrogram
from .base import Embedder, _require_random_weights_optin

__all__ = ["VGGish", "vggish_log_mel_patches", "convert_torch_state_dict"]

logger = logging.getLogger(__name__)

# torchvggish release weights — the URL torch.hub resolves for the
# reference's ``torch.hub.load("harritaylor/torchvggish")`` (vggish.py:7).
VGGISH_CHECKPOINT_URL = (
    "https://github.com/harritaylor/torchvggish/releases/download/"
    "v0.1/vggish-10086976.pth"
)

SAMPLE_RATE = 16000
_FRAME_LEN = 400  # 25 ms
_HOP = 160  # 10 ms
_N_FFT = 512
_N_MELS = 64
_PATCH_FRAMES = 96
_CONV_CHANNELS = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512)]
# features indices of conv layers in the torch Sequential
_TORCH_CONV_IDX = [0, 3, 6, 8, 11, 13]
# maxpool after these conv positions (0-based in conv list)
_POOL_AFTER = {0, 1, 3, 5}
_FC_DIMS = [(512 * 4 * 6, 4096), (4096, 4096), (4096, 128)]
_TORCH_FC_IDX = [0, 2, 4]


def vggish_log_mel_patches(audio, sr: int = SAMPLE_RATE):
    """audio (B, n) -> (B, n_patches, 96, 64) log-mel examples."""
    mel = log_mel_spectrogram(
        audio,
        sampling_rate=sr,
        frame_length=_FRAME_LEN,
        hop_length=_HOP,
        n_fft=_N_FFT,
        n_mels=_N_MELS,
        fmin=125.0,
        fmax=7500.0,
        center=False,
        power=1.0,  # magnitude, not power
        mel_norm=None,
        mel_scale="htk",
        triangle_domain="mel",
        zero_dc=True,
        log_mode="natural",
        log_offset=0.01,
    )
    b, n_frames, n_mels = mel.shape
    n_patches = n_frames // _PATCH_FRAMES
    return mel[:, : n_patches * _PATCH_FRAMES].reshape(
        b, n_patches, _PATCH_FRAMES, n_mels
    )


def init_params(seed: int = 0) -> dict:
    """Random-init parameters with torchvggish state-dict naming."""
    rng = np.random.default_rng(seed)
    params = {}
    for (c_in, c_out), idx in zip(_CONV_CHANNELS, _TORCH_CONV_IDX):
        scale = np.sqrt(2.0 / (c_in * 9))
        params[f"features.{idx}.weight"] = rng.normal(
            scale=scale, size=(c_out, c_in, 3, 3)
        ).astype(np.float32)
        params[f"features.{idx}.bias"] = np.zeros(c_out, np.float32)
    for (d_in, d_out), idx in zip(_FC_DIMS, _TORCH_FC_IDX):
        scale = np.sqrt(2.0 / d_in)
        params[f"embeddings.{idx}.weight"] = rng.normal(
            scale=scale, size=(d_out, d_in)
        ).astype(np.float32)
        params[f"embeddings.{idx}.bias"] = np.zeros(d_out, np.float32)
    return params


def convert_torch_state_dict(state_dict) -> dict:
    """torchvggish state dict -> our param dict (same names, numpy arrays)."""
    out = {}
    for k, v in state_dict.items():
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        out[k] = arr.astype(np.float32)
    return out


@partial(jax.jit, static_argnames=("compute_dtype",))
def _forward(params: dict, patches, compute_dtype=None):
    """patches (N, 96, 64) -> (N, 128) pre-activation embeddings.

    compute_dtype=bfloat16 runs the conv/fc matmuls on the MXU in bf16 with
    f32 accumulation; outputs stay f32.
    """
    dtype = compute_dtype or jnp.float32
    x = patches[:, None, :, :].astype(dtype)  # NCHW
    for i, idx in enumerate(_TORCH_CONV_IDX):
        w = params[f"features.{idx}.weight"]
        b = params[f"features.{idx}.bias"]
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w).astype(dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ) + jnp.asarray(b)[None, :, None, None]
        x = jax.nn.relu(x).astype(dtype)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
    # torch: permute NCHW -> NHWC then flatten (vggish.py network definition)
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(x.shape[0], -1)
    for i, idx in enumerate(_TORCH_FC_IDX):
        w = jnp.asarray(params[f"embeddings.{idx}.weight"]).astype(dtype)
        b = jnp.asarray(params[f"embeddings.{idx}.bias"])
        x = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
        if i < 2:
            x = jax.nn.relu(x).astype(dtype)
    return x.astype(jnp.float32)


@partial(jax.jit, static_argnames=("compute_dtype",))
def _embed(params: dict, audio, compute_dtype=None):
    patches = vggish_log_mel_patches(audio)
    b, t = patches.shape[:2]
    flat = patches.reshape(b * t, _PATCH_FRAMES, _N_MELS)
    emb = _forward(params, flat, compute_dtype)
    return emb.reshape(b, t, -1).mean(axis=1)


class VGGish(Embedder):
    """128-d pre-activation VGGish embeddings averaged over 0.96 s patches."""

    names = ("embedding",)

    def __init__(
        self,
        params: dict | None = None,
        ckpt: str | None = None,
        compute_dtype: str | None = None,
        allow_random_weights: bool = False,
    ):
        if params is None:
            src = ckpt if ckpt is not None else VGGISH_CHECKPOINT_URL
            from ..utils.get_url import resolve_checkpoint

            path = resolve_checkpoint(src)
            if path is not None:
                params = load_checkpoint(path)
        if params is None:
            _require_random_weights_optin("VGGish", ckpt, allow_random_weights)
            params = init_params()
        self.params = jax.tree.map(jnp.asarray, params)
        self.compute_dtype = jnp.dtype(compute_dtype).type if compute_dtype else None

    @property
    def sr(self) -> int:
        return SAMPLE_RATE

    @property
    def embed_fn(self):
        """Pure (B, n) -> (B, 128) forward for the pipeline's fused
        device-resident loop."""

        dt = self.compute_dtype

        def fn(params, audio):
            return _embed(params, audio, dt)

        return fn

    def forward(self, data: dict) -> dict:
        audio = jnp.asarray(data["audio"], dtype=jnp.float32)
        if audio.ndim == 1:
            audio = audio[None]
        return {"embedding": _embed(self.params, audio, self.compute_dtype)}


def load_checkpoint(path: str) -> dict:
    """Load a torchvggish .pth checkpoint (or the torch-free .npz written
    by ``python -m audio_metrics_tpu convert``) from a local path."""
    if str(path).endswith(".npz"):
        params = {k: np.asarray(v) for k, v in np.load(path).items()}
        expected = set(init_params())
        missing = expected - set(params)
        if missing:
            raise ValueError(
                f"npz checkpoint {path} incomplete: missing {sorted(missing)[:5]}"
            )
        return {k: v for k, v in params.items() if k in expected}
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params = convert_torch_state_dict(state)
    expected = set(init_params())
    missing = expected - set(params)
    if missing:
        raise ValueError(
            f"torchvggish checkpoint {path} incomplete: {len(missing)} of "
            f"{len(expected)} keys missing, e.g. {sorted(missing)[:5]} — "
            "wrong checkpoint or layout drift"
        )
    return {k: v for k, v in params.items() if k in expected}
