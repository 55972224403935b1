"""Checkpoint download cache.

Counterpart of reference util/get_url.py:44-72 (URL -> appdirs user cache
dir, download-once).  stdlib-only: cache dir resolves to
``$AM_TPU_CACHE_DIR``, else ``$XDG_CACHE_HOME/audio_metrics_tpu``, else
``~/.cache/audio_metrics_tpu``.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from urllib import request

__all__ = ["download_url", "cache_dir", "resolve_checkpoint"]

logger = logging.getLogger(__name__)


def cache_dir() -> Path:
    env = os.environ.get("AM_TPU_CACHE_DIR")
    if env:
        return Path(env)
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = Path(xdg) if xdg else Path.home() / ".cache"
    return base / "audio_metrics_tpu"


def resolve_checkpoint(src: str) -> str | None:
    """Best-effort local resolution of a checkpoint URL or path.

    Search order: an explicit local path; ``$AM_TPU_CKPT_DIR/<basename>``
    (provisioned checkpoints on air-gapped hosts); the download cache; and
    finally a network download.  Returns None when nothing is reachable —
    the *caller* decides whether that is fatal (embedders raise by default).
    """
    name = src.rsplit("/", maxsplit=1)[-1]
    if Path(src).exists():
        return str(src)
    ckpt_dir = os.environ.get("AM_TPU_CKPT_DIR")
    if ckpt_dir and (Path(ckpt_dir) / name).exists():
        return (Path(ckpt_dir) / name).as_posix()
    if (cache_dir() / name).exists():
        return (cache_dir() / name).as_posix()
    try:
        return download_url(src)
    except Exception as exc:
        logger.warning("checkpoint %s unavailable: %s", name, exc)
        return None


def download_url(url: str) -> str:
    """Return a local path for ``url``, downloading into the cache once."""
    name = url.rsplit("/", maxsplit=1)[-1]
    fp = cache_dir() / name
    if not fp.exists():
        fp.parent.mkdir(parents=True, exist_ok=True)
        logger.info("Downloading %s to %s", url, fp)
        tmp = fp.with_suffix(fp.suffix + ".part")
        try:
            request.urlretrieve(url, filename=tmp, reporthook=_progress_hook(name))
            tmp.replace(fp)
        except Exception as exc:
            tmp.unlink(missing_ok=True)
            raise RuntimeError(f"Error downloading {url}") from exc
    return fp.as_posix()


def _progress_hook(desc: str):
    """tqdm download progress (reference get_url.py:12-41); no-op without
    tqdm or without a tty."""
    try:
        from tqdm import tqdm
    except ImportError:
        return None
    bar = tqdm(
        desc=desc, unit="B", unit_scale=True, unit_divisor=1024, leave=False
    )

    def hook(blocks: int, block_size: int, total_size: int):
        if total_size > 0 and bar.total != total_size:
            bar.total = total_size
        bar.update(blocks * block_size - bar.n)

    return hook
