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

__all__ = ["download_url", "cache_dir"]

logger = logging.getLogger(__name__)


def cache_dir() -> Path:
    env = os.environ.get("AM_TPU_CACHE_DIR")
    if env:
        return Path(env)
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = Path(xdg) if xdg else Path.home() / ".cache"
    return base / "audio_metrics_tpu"


def download_url(url: str) -> str:
    """Return a local path for ``url``, downloading into the cache once."""
    name = url.rsplit("/", maxsplit=1)[-1]
    fp = cache_dir() / name
    if not fp.exists():
        fp.parent.mkdir(parents=True, exist_ok=True)
        logger.info("Downloading %s to %s", url, fp)
        tmp = fp.with_suffix(fp.suffix + ".part")
        try:
            request.urlretrieve(url, filename=tmp)
            tmp.replace(fp)
        except Exception as exc:
            tmp.unlink(missing_ok=True)
            raise RuntimeError(f"Error downloading {url}") from exc
    return fp.as_posix()
