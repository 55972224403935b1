"""HTSAT/CLAP encoder parity vs the torch implementation in transformers.

transformers' ClapAudioModel is a faithful torch port of the LAION HTSAT
encoder; instantiating it with random weights and converting its state dict
gives a full numerical oracle for our JAX implementation — patch embed, swin
blocks (incl. shifted-window masks and relative position bias), patch
merging, the token-semantic reshape and pooling, and the projection layers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audio_metrics_tpu.models.htsat import (
    HTSATConfig,
    htsat_encode,
)
from audio_metrics_tpu.models.clap import convert_checkpoint


def _hf_audio_model(embed_dim, depths, heads, hidden):
    from transformers import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModel

    cfg = ClapAudioConfig(
        patch_embeds_hidden_size=embed_dim,
        depths=list(depths),
        num_attention_heads=list(heads),
        hidden_size=hidden,
        drop_path_rate=0.0,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = ClapAudioModel(cfg).eval()
    # randomize batch-norm running stats so that branch is exercised too
    with torch.no_grad():
        model.audio_encoder.batch_norm.running_mean.normal_(0, 0.5)
        model.audio_encoder.batch_norm.running_var.uniform_(0.5, 2.0)
    return model


@pytest.mark.parametrize(
    "embed_dim,depths,heads",
    [
        (96, (2, 2, 6, 2), (4, 8, 16, 32)),  # tiny (HF default)
        (128, (2, 2, 12, 2), (4, 8, 16, 32)),  # base (the reference's model)
    ],
)
def test_htsat_matches_transformers(embed_dim, depths, heads):
    hidden = embed_dim * 8
    model = _hf_audio_model(embed_dim, depths, heads, hidden)

    params = convert_checkpoint(model.state_dict())
    # HF ClapAudioModel state dict starts at "audio_encoder."; ours expects that
    assert any(k.startswith("audio_encoder.layers.0.blocks.0") for k in params)

    cfg = HTSATConfig(embed_dim=embed_dim, depths=depths, num_heads=heads)

    rng = np.random.default_rng(1)
    # mel input: (B, 1, T, 64) for HF; T=1001 exercises the bicubic resize
    mel = rng.normal(size=(2, 1, 1001, 64)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(mel)).pooler_output.numpy()

    got = np.asarray(htsat_encode(params, mel[:, 0], cfg))
    assert got.shape == want.shape == (2, hidden)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)


def test_htsat_exact_time_length():
    # T == 1024 skips interpolation entirely
    embed_dim, depths, heads = 96, (2, 2, 6, 2), (4, 8, 16, 32)
    model = _hf_audio_model(embed_dim, depths, heads, embed_dim * 8)
    params = convert_checkpoint(model.state_dict())
    cfg = HTSATConfig(embed_dim=embed_dim, depths=depths, num_heads=heads)
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, 1, 1024, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mel)).pooler_output.numpy()
    got = np.asarray(htsat_encode(params, mel[:, 0], cfg))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)


def test_laion_key_conversion():
    # fused-qkv splitting and LAION renames
    d = 8
    sd = {
        "module.audio_branch.layers.0.blocks.0.attn.qkv.weight": np.arange(
            3 * d * d, dtype=np.float32
        ).reshape(3 * d, d),
        "module.audio_branch.layers.0.blocks.0.attn.qkv.bias": np.arange(
            3 * d, dtype=np.float32
        ),
        "module.audio_branch.layers.0.blocks.0.attn.proj.weight": np.zeros((d, d), np.float32),
        "module.audio_branch.layers.0.blocks.0.norm1.weight": np.ones(d, np.float32),
        "module.audio_branch.bn0.running_mean": np.zeros(4, np.float32),
        "module.audio_projection.0.weight": np.zeros((4, 8), np.float32),
        "module.audio_projection.2.weight": np.zeros((4, 4), np.float32),
        "module.text_branch.embeddings.weight": np.zeros((4, 4), np.float32),
    }
    params = convert_checkpoint(sd)
    base = "audio_encoder.layers.0.blocks.0"
    assert params[f"{base}.attention.self.query.weight"].shape == (d, d)
    np.testing.assert_array_equal(
        params[f"{base}.attention.self.key.bias"], np.arange(d, 2 * d, dtype=np.float32)
    )
    assert f"{base}.attention.output.dense.weight" in params
    assert f"{base}.layernorm_before.weight" in params
    assert "audio_encoder.batch_norm.running_mean" in params
    assert "audio_projection.linear1.weight" in params
    assert "audio_projection.linear2.weight" in params
    # text tower dropped
    assert not any("text" in k for k in params)


@pytest.mark.parametrize("res,c,dtype", [(64, 128, "float32"), (16, 512, "float32"), (64, 128, "bfloat16")])
def test_patch_merging_conv_matches_gather(res, c, dtype):
    """The conv-with-folded-LN patch merging must match the direct
    concat->LN->linear form (the transformers ClapAudioPatchMerging math)."""
    import jax.numpy as jnp
    from audio_metrics_tpu.models.htsat import (
        HTSAT_BASE,
        _patch_merging,
        _patch_merging_gather,
    )

    rng = np.random.default_rng(res + c)
    prefix = "m"
    params = {
        f"{prefix}.norm.weight": jnp.asarray(
            rng.normal(1.0, 0.2, 4 * c).astype(np.float32)
        ),
        f"{prefix}.norm.bias": jnp.asarray(
            rng.normal(0.0, 0.2, 4 * c).astype(np.float32)
        ),
        f"{prefix}.reduction.weight": jnp.asarray(
            rng.normal(0.0, 0.05, (2 * c, 4 * c)).astype(np.float32)
        ),
    }
    # offset +3: nonzero mean stresses the centered-variance path
    x = jnp.asarray(
        (rng.normal(0.0, 1.0, (2, res * res, c)) + 3.0).astype(np.float32)
    ).astype(dtype)
    want = np.asarray(
        _patch_merging_gather(x, params, prefix, HTSAT_BASE, res), np.float32
    )
    got = np.asarray(_patch_merging(x, params, prefix, HTSAT_BASE, res), np.float32)
    tol = 5e-5 if dtype == "float32" else 0.15
    np.testing.assert_allclose(got, want, atol=tol * np.abs(want).max())


@pytest.mark.parametrize("t", [1001, 1024])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_frontend_tokens_matches_image_path(t, dtype):
    """The restructured frontend (no image materialization, one 6-d
    transpose) must be bitwise-equal to the reshape_mel2img + patchify
    path: same products, same f32-accumulated matmul."""
    import jax.numpy as jnp

    from audio_metrics_tpu.models.htsat import (
        HTSAT_BASE,
        _patch_tokens,
        frontend_tokens,
        init_params,
        reshape_mel2img,
    )

    params = {k: jnp.asarray(v) for k, v in init_params(HTSAT_BASE).items()}
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(size=(3, t, 64)).astype(np.float32))
    dt = jnp.dtype(dtype)

    # the image path must see the same interp operand dtype the fused path
    # derives from compute_dtype (bf16 compute -> bf16 interp operands)
    op_dt = jnp.bfloat16 if dt == jnp.bfloat16 else None
    want = np.asarray(
        _patch_tokens(
            params, reshape_mel2img(mel, HTSAT_BASE, op_dt), HTSAT_BASE, dt
        ),
        np.float32,
    )
    got = np.asarray(frontend_tokens(params, mel, HTSAT_BASE, dt), np.float32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
