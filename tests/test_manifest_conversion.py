"""Checkpoint conversion pinned against authentic state-dict manifests.

The real weight files are unreachable from this host (zero egress), so the
converters are pinned against committed key/shape manifests of the actual
checkpoints the reference loads (embedders/clap.py:5-18, vggish.py:7-13),
derived from published surfaces — transformers' ClapAudioModel/RobertaModel
plus the published HTSAT-base audio_cfg (see scripts/gen_manifests.py).
A checkpoint with exactly the manifest layout must convert completely
(strict) and to the exact key/shape set the JAX forward consumes; every
non-audio key must be dropped, silently and totally.
"""

import json
import os

import numpy as np
import pytest

from audio_metrics_tpu.models.clap import (
    convert_checkpoint,
    expected_param_keys,
    init_projection_params,
)
from audio_metrics_tpu.models.htsat import HTSAT_BASE, init_params

MANIFEST_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "audio_metrics_tpu",
    "models",
    "manifests",
)


def _load(name):
    with open(os.path.join(MANIFEST_DIR, name)) as f:
        return json.load(f)


def _fabricate(manifest):
    """Unique-valued arrays per manifest entry (catches key crosswiring)."""
    sd = {}
    for section in ("used", "dropped"):
        for key, shape in manifest[section].items():
            n = int(np.prod(shape)) if shape else 1
            seed = abs(hash(key)) % 1000
            sd[key] = (
                np.arange(n, dtype=np.float32).reshape(shape or ()) + seed
            )
    return sd


def test_clap_manifest_converts_completely_and_strictly():
    manifest = _load("laion_clap_htsat_base.json")
    sd = _fabricate(manifest)
    assert len(sd) == len(manifest["used"]) + len(manifest["dropped"])

    params = convert_checkpoint(sd, cfg=HTSAT_BASE, strict=True)

    expected = expected_param_keys(HTSAT_BASE)
    assert set(params) == expected
    init = init_params(HTSAT_BASE, seed=0)
    init.update(init_projection_params(HTSAT_BASE))
    for k in expected:
        assert params[k].shape == np.asarray(init[k]).shape, k
    # nothing from the text tower / DSP frontend / classifier heads leaks
    for k in params:
        assert not any(
            frag in k for frag in ("text", "tscam", "stft", "logmel", "head.", "logit")
        ), k


def test_clap_manifest_qkv_split_is_positionally_correct():
    """The fused qkv thirds must land on query/key/value in that order."""
    manifest = _load("laion_clap_htsat_base.json")
    key = "module.audio_branch.layers.2.blocks.7.attn.qkv.bias"
    shape = manifest["used"][key]
    sd = {key: np.arange(shape[0], dtype=np.float32)}
    params = convert_checkpoint(sd)
    d = shape[0] // 3
    base = "audio_encoder.layers.2.blocks.7.attention.self"
    np.testing.assert_array_equal(
        params[f"{base}.query.bias"], np.arange(d, dtype=np.float32)
    )
    np.testing.assert_array_equal(
        params[f"{base}.value.bias"], np.arange(2 * d, 3 * d, dtype=np.float32)
    )


def test_clap_manifest_strict_raises_on_missing_block():
    manifest = _load("laion_clap_htsat_base.json")
    sd = _fabricate(manifest)
    # drop one transformer block's qkv -> strict conversion must fail loudly
    del sd["module.audio_branch.layers.2.blocks.7.attn.qkv.weight"]
    with pytest.raises(ValueError, match="missing"):
        convert_checkpoint(sd, cfg=HTSAT_BASE, strict=True)


def test_clap_manifest_matches_live_transformers_surface():
    """Guard against manifest drift: re-derive the audio-tower section from
    a live transformers ClapAudioModel and compare keys AND shapes."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from gen_manifests import clap_audio_tower

    manifest = _load("laion_clap_htsat_base.json")
    committed = {
        k[len("module.") :]: tuple(v)
        for section in ("used", "dropped")
        for k, v in manifest[section].items()
        if k.startswith("module.audio_branch.")
        and not any(
            frag in k for frag in ("stft", "logmel", "tscam", ".head.")
        )
    }
    live = {k: tuple(v) for k, v in clap_audio_tower().items()}
    assert committed == live


def test_vggish_manifest_conversion():
    from audio_metrics_tpu.models.vggish import (
        convert_torch_state_dict,
        init_params as vgg_init,
    )

    manifest = _load("vggish_torchhub.json")
    sd = _fabricate(manifest)
    params = convert_torch_state_dict(sd)
    expected = vgg_init()
    assert set(params) == set(expected)
    for k, v in expected.items():
        assert params[k].shape == np.asarray(v).shape, k


def test_vggish_pth_load_raises_on_incomplete(tmp_path):
    torch = pytest.importorskip("torch")
    from audio_metrics_tpu.models.vggish import load_checkpoint

    manifest = _load("vggish_torchhub.json")
    sd = {
        k: torch.zeros(tuple(shape))
        for k, shape in manifest["used"].items()
        if k != "embeddings.4.weight"
    }
    path = tmp_path / "broken.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="incomplete"):
        load_checkpoint(str(path))
