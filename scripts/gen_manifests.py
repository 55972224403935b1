"""Generate authentic checkpoint key/shape manifests (no weights needed).

Writes ``audio_metrics_tpu/models/manifests/*.json`` — the exact state-dict
key -> shape maps of the two real checkpoints the reference loads:

- ``laion_clap_htsat_base.json``: the LAION music checkpoint
  (music_audioset_epoch_15_esc_90.14.pt, reference embedders/clap.py:5-18),
  i.e. ``torch.save``d ``model.state_dict()`` of
  ``laion_clap.CLAP_Module(enable_fusion=False, amodel="HTSAT-base")``
  trained under DDP (every key carries a ``module.`` prefix).
- ``vggish_torchhub.json``: the harritaylor/torchvggish release weights
  (vggish-10086976.pth, reference embedders/vggish.py:7-13).

Derivation (all from published, locally available sources — the actual
weight files are not reachable from this host):

1. The HTSAT transformer surface is generated from a live
   ``transformers.ClapAudioModel`` instantiated with the HTSAT-base dims
   (patch_embeds_hidden_size=128, depths 2-2-12-2, heads 4-8-16-32,
   hidden_size=1024).  transformers' CLAP is the faithful HF port of the
   LAION model, so its state dict IS the authentic per-tensor surface; the
   keys are mapped back to the LAION naming by inverting the rename table
   in ``models/clap.py`` (q/k/v fused back into ``attn.qkv``).
2. The DSP-frontend buffers (torchlibrosa STFT conv pair + mel filterbank)
   and the token-semantic head follow the published HTSAT-base audio_cfg
   (sample_rate 48000, window_size 1024, hop 480, mel_bins 64, class_num
   527; laion_clap model_configs/HTSAT-base.json) and the HTSAT module
   structure: conv_real/conv_imag are (n_fft//2+1, 1, n_fft), melW is
   (n_fft//2+1, mel_bins), tscam_conv is Conv2d(num_features -> class_num,
   kernel (SF, 3)) with SF = spec_size / 2^(stages-1) / patch_stride /
   freq_ratio = 256/8/4/4 = 2, head is Linear(class_num, class_num).
3. The text tower is HF ``RobertaModel`` (laion_clap instantiates it
   directly), generated live from transformers with the roberta-base
   config; text_projection mirrors audio_projection at 768 -> 512.
4. torchvggish is ``VGG(make_layers())``: convs at features indices
   0,3,6,8,11,13 and Linear embeddings at 0,2,4 — the same structural
   constants models/vggish.py encodes and validates against its in-test
   torch replica.

Keys the audio forward consumes are tagged ``"used"``; everything else is
``"dropped"`` (the converter must consume the whole file without error and
produce exactly ``expected_param_keys``).  tests/test_manifest_conversion.py
pins ``convert_checkpoint`` against these files.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_manifests.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "audio_metrics_tpu",
    "models",
    "manifests",
)

# HF -> LAION key-fragment renames: the inverse of models/clap.py's
# _LAION_RENAMES (order matters: attention.* fragments before output.dense).
_HF_TO_LAION = [
    ("attention.output.dense.", "attn.proj."),
    ("attention.self.relative_position_bias_table", "attn.relative_position_bias_table"),
    ("attention.self.relative_position_index", "attn.relative_position_index"),
    ("intermediate.dense.", "mlp.fc1."),
    ("output.dense.", "mlp.fc2."),
    ("layernorm_before.", "norm1."),
    ("layernorm_after.", "norm2."),
    ("batch_norm.", "bn0."),
]


def clap_audio_tower():
    """LAION-named key->shape map of the HTSAT-base audio tower, derived
    from a live transformers ClapAudioModel (authentic per-tensor surface)."""
    from transformers import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModel

    cfg = ClapAudioConfig(
        patch_embeds_hidden_size=128,
        depths=[2, 2, 12, 2],
        num_attention_heads=[4, 8, 16, 32],
        hidden_size=1024,
    )
    sd = ClapAudioModel(cfg).state_dict()

    out = {}
    qkv = {}
    for key, val in sd.items():
        assert key.startswith("audio_encoder.")
        key = key[len("audio_encoder.") :]
        if ".attention.self." in key and any(
            f".{n}." in key for n in ("query", "key", "value")
        ):
            # fuse q/k/v back into LAION's attn.qkv
            prefix, rest = key.split(".attention.self.", 1)
            name, kind = rest.split(".", 1)  # e.g. "query", "weight"
            qkv.setdefault((prefix, kind), {})[name] = tuple(val.shape)
            continue
        for hf, laion in _HF_TO_LAION:
            key = key.replace(hf, laion)
        out[f"audio_branch.{key}"] = list(val.shape)
    for (prefix, kind), parts in qkv.items():
        assert set(parts) == {"query", "key", "value"}
        q = parts["query"]
        shape = [3 * q[0]] + list(q[1:])
        out[f"audio_branch.{prefix}.attn.qkv.{kind}"] = shape
    return out


def clap_frontend_and_head():
    """HTSAT-base DSP buffers + token-semantic head (published audio_cfg)."""
    n_fft, mel_bins, class_num, num_features = 1024, 64, 527, 1024
    sf = 256 // 8 // 4 // 4  # spec_size / 2^(stages-1) / patch_stride / freq_ratio
    return {
        "audio_branch.spectrogram_extractor.stft.conv_real.weight": [n_fft // 2 + 1, 1, n_fft],
        "audio_branch.spectrogram_extractor.stft.conv_imag.weight": [n_fft // 2 + 1, 1, n_fft],
        "audio_branch.logmel_extractor.melW": [n_fft // 2 + 1, mel_bins],
        "audio_branch.tscam_conv.weight": [class_num, num_features, sf, 3],
        "audio_branch.tscam_conv.bias": [class_num],
        "audio_branch.head.weight": [class_num, class_num],
        "audio_branch.head.bias": [class_num],
    }


def clap_text_tower():
    """RoBERTa-base text tower (laion_clap wraps HF RobertaModel directly)."""
    from transformers import RobertaConfig, RobertaModel

    sd = RobertaModel(RobertaConfig()).state_dict()
    out = {f"text_branch.{k}": list(v.shape) for k, v in sd.items()}
    return out


def clap_hf_manifest():
    """HF transformers ``ClapModel`` full state-dict surface at the
    HTSAT-base audio dims (the second checkpoint format ``convert_checkpoint``
    accepts; VERDICT r3 #5 asked for dry-conversion pinning of BOTH formats).

    Generated live from transformers — keys stay in HF naming (no
    inverse-mapping): ``audio_model.audio_encoder.*`` (q/k/v unfused),
    ``text_model.*``, ``audio_projection.linear{1,2}.*``, logit scales.
    """
    import numpy as np
    from transformers import ClapAudioConfig, ClapConfig, ClapTextConfig
    from transformers.models.clap.modeling_clap import ClapModel

    from audio_metrics_tpu.models.clap import convert_checkpoint, expected_param_keys
    from audio_metrics_tpu.models.htsat import HTSAT_BASE

    cfg = ClapConfig(
        audio_config=ClapAudioConfig(
            patch_embeds_hidden_size=128,
            depths=[2, 2, 12, 2],
            num_attention_heads=[4, 8, 16, 32],
            hidden_size=1024,
        ).to_dict(),
        text_config=ClapTextConfig().to_dict(),
    )
    sd = ClapModel(cfg).state_dict()
    used, dropped = {}, {}
    expected = expected_param_keys(HTSAT_BASE)
    for key, val in sd.items():
        shape = list(val.shape)
        got = convert_checkpoint({key: np.zeros(shape or (), np.float32)}, cfg=None)
        target = used if (got and set(got) & expected) else dropped
        target[key] = shape
    return {
        "_source": "transformers ClapModel(ClapConfig(audio_config=HTSAT-base "
        "dims, text_config=ClapTextConfig())) state_dict — the HF-format "
        "surface convert_checkpoint accepts alongside the LAION .pt layout.  "
        "See scripts/gen_manifests.py.",
        "used": used,
        "dropped": dropped,
    }


def clap_projections():
    return {
        "audio_projection.0.weight": [512, 1024],
        "audio_projection.0.bias": [512],
        "audio_projection.2.weight": [512, 512],
        "audio_projection.2.bias": [512],
        "text_projection.0.weight": [512, 768],
        "text_projection.0.bias": [512],
        "text_projection.2.weight": [512, 512],
        "text_projection.2.bias": [512],
        "logit_scale_a": [],
        "logit_scale_t": [],
    }


def vggish_manifest():
    from audio_metrics_tpu.models.vggish import (
        _CONV_CHANNELS,
        _FC_DIMS,
        _TORCH_CONV_IDX,
        _TORCH_FC_IDX,
    )

    keys = {}
    for (c_in, c_out), idx in zip(_CONV_CHANNELS, _TORCH_CONV_IDX):
        keys[f"features.{idx}.weight"] = [c_out, c_in, 3, 3]
        keys[f"features.{idx}.bias"] = [c_out]
    for (d_in, d_out), idx in zip(_FC_DIMS, _TORCH_FC_IDX):
        keys[f"embeddings.{idx}.weight"] = [d_out, d_in]
        keys[f"embeddings.{idx}.bias"] = [d_out]
    return {
        "_source": "harritaylor/torchvggish release vggish-10086976.pth "
        "(reference embedders/vggish.py:7-13): VGG(make_layers()) — convs at "
        "features indices 0,3,6,8,11,13, Linear embeddings at 0,2,4",
        "used": keys,
        "dropped": {},
    }


def main():
    os.makedirs(OUT_DIR, exist_ok=True)

    audio = clap_audio_tower()
    used, dropped = {}, {}
    # keys the JAX forward consumes: the transformer weights + bn0 stats
    # (buffers like relative_position_index are recomputed host-side and
    # dropped, as are the DSP frontend, heads, text tower, logit scales)
    from audio_metrics_tpu.models.clap import convert_checkpoint, expected_param_keys
    from audio_metrics_tpu.models.htsat import HTSAT_BASE

    for k, shape in {**audio, **clap_frontend_and_head(), **clap_text_tower(),
                     **clap_projections()}.items():
        key = f"module.{k}" if k.startswith(("audio_", "text_", "logit_")) else k
        # classify: run the key alone through the converter's rename+filter
        import numpy as np

        got = convert_checkpoint({key: np.zeros(shape or (), np.float32)}, cfg=None)
        target = used if (
            got and set(got) & expected_param_keys(HTSAT_BASE)
        ) else dropped
        target[key] = shape

    clap = {
        "_source": "laion_clap CLAP_Module(enable_fusion=False, amodel="
        "'HTSAT-base') state_dict under DDP ('module.' prefix) — the music "
        "checkpoint the reference loads (embedders/clap.py:5-18).  "
        "Transformer surface generated from transformers.ClapAudioModel "
        "(HTSAT-base dims) with keys inverse-mapped to LAION naming; text "
        "tower from transformers.RobertaModel (roberta-base config); DSP "
        "buffers/heads from the published HTSAT-base audio_cfg.  See "
        "scripts/gen_manifests.py.",
        "used": used,
        "dropped": dropped,
    }
    with open(os.path.join(OUT_DIR, "laion_clap_htsat_base.json"), "w") as f:
        json.dump(clap, f, indent=1, sort_keys=True)
    hf = clap_hf_manifest()
    with open(os.path.join(OUT_DIR, "laion_clap_htsat_base_hf.json"), "w") as f:
        json.dump(hf, f, indent=1, sort_keys=True)
    with open(os.path.join(OUT_DIR, "vggish_torchhub.json"), "w") as f:
        json.dump(vggish_manifest(), f, indent=1, sort_keys=True)
    print(
        f"wrote manifests: clap used={len(used)} dropped={len(dropped)}, "
        f"clap-hf used={len(hf['used'])} dropped={len(hf['dropped'])}, "
        f"vggish used={len(vggish_manifest()['used'])}"
    )


if __name__ == "__main__":
    main()
