"""CLI surface: python -m audio_metrics_tpu {evaluate, convert}.

Drives the argparse entry in-process (the conftest CPU backend applies) over
real WAV directories written with utils.wavio.
"""

import json

import numpy as np
import pytest

from audio_metrics_tpu.__main__ import main
from audio_metrics_tpu.utils.wavio import write_wav

SR = 16000


def _write_dir(path, n_items, seed, stereo=False):
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_items):
        shape = (5 * SR, 2) if stereo else (5 * SR,)
        write_wav(path / f"{i:03d}.wav", 0.2 * rng.normal(size=shape), SR)


def test_cli_evaluate_stems(tmp_path, capsys):
    _write_dir(tmp_path / "ref", 8, seed=0)
    _write_dir(tmp_path / "cand", 8, seed=1)
    rc = main(
        [
            "evaluate",
            "--reference", str(tmp_path / "ref"),
            "--candidate", str(tmp_path / "cand"),
            "--metrics", "fad", "kd", "prdc",
            "--embedder", "dummy",
            "--mix-function", "P1",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    for key in ("fad", "kernel_distance_mean", "precision", "recall"):
        assert key in out and np.isfinite(out[key])


def test_cli_state_roundtrip(tmp_path, capsys):
    _write_dir(tmp_path / "ref", 8, seed=0)
    _write_dir(tmp_path / "cand", 8, seed=1)
    common = ["--metrics", "fad", "--embedder", "dummy", "--mix-function", "P1"]
    state = tmp_path / "ref_state.npz"
    rc = main(
        ["evaluate", "--reference", str(tmp_path / "ref"),
         "--candidate", str(tmp_path / "cand"),
         "--save-state", str(state)] + common
    )
    assert rc == 0
    first = json.loads(capsys.readouterr().out)
    rc = main(
        ["evaluate", "--load-state", str(state),
         "--candidate", str(tmp_path / "cand"),
         "--input-sr", str(SR)] + common
    )
    assert rc == 0
    second = json.loads(capsys.readouterr().out)
    np.testing.assert_allclose(second["fad"], first["fad"], rtol=1e-6)


def test_cli_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["evaluate", "--candidate", str(tmp_path / "nope")])
    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit):
        main(["evaluate", "--reference", str(tmp_path / "empty")])


def test_cli_convert_vggish_npz_roundtrip(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from test_models import _torch_vggish
    from audio_metrics_tpu.models.vggish import VGGish

    net = _torch_vggish()
    src = tmp_path / "vggish.pth"
    torch.save(net.state_dict(), src)
    out = tmp_path / "vggish.npz"
    rc = main(["convert", str(src), str(out), "--arch", "vggish"])
    assert rc == 0
    emb = VGGish(ckpt=str(out))  # torch-free load path
    audio = 0.1 * np.random.default_rng(0).normal(size=(2, SR)).astype(np.float32)
    e = np.asarray(emb.forward({"audio": audio})["embedding"])
    assert e.shape == (2, 128) and np.isfinite(e).all()


def test_clap_npz_checkpoint_load(tmp_path):
    """The torch-free .npz format round-trips through LaionCLAP(ckpt=...)."""
    from audio_metrics_tpu.models.clap import (
        LaionCLAP,
        init_projection_params,
    )
    from audio_metrics_tpu.models.htsat import HTSAT_BASE, init_params

    params = init_params(HTSAT_BASE, seed=3)
    params.update(init_projection_params(HTSAT_BASE, seed=3))
    fp = tmp_path / "clap.npz"
    np.savez(fp, **{k: np.asarray(v) for k, v in params.items()})
    emb = LaionCLAP(ckpt=str(fp))
    ref = LaionCLAP(params=params)
    np.testing.assert_array_equal(
        np.asarray(emb.params["audio_projection.linear1.weight"]),
        np.asarray(ref.params["audio_projection.linear1.weight"]),
    )
    # incomplete npz must fail loudly
    bad = {k: v for k, v in params.items() if "linear1" not in k}
    fp2 = tmp_path / "bad.npz"
    np.savez(fp2, **{k: np.asarray(v) for k, v in bad.items()})
    with pytest.raises(ValueError, match="incomplete"):
        LaionCLAP(ckpt=str(fp2))
