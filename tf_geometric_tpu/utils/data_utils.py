"""Download + pickle-cache helpers (reference: utils/data_utils.py:7-34)."""
from __future__ import annotations

import os
import pickle
import shutil
import urllib.request

__all__ = ["download_file", "save_cache", "load_cache", "extract_archive"]


def download_file(path: str, urls, verbose: bool = True) -> str:
    """Fetch ``path`` from the first URL that works (multi-URL failover,
    data_utils.py:7-21). Raises if all fail (e.g. no-egress environments —
    callers should pre-place files under the raw dir instead)."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if isinstance(urls, str):
        urls = [urls]
    last_err = None
    for url in urls:
        try:
            if verbose:
                print(f"downloading {url} -> {path}")
            tmp = path + ".part"
            with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
            os.replace(tmp, path)
            return path
        except Exception as e:  # noqa: BLE001 — try next mirror
            last_err = e
    raise RuntimeError(f"failed to download {path} from {urls}: {last_err}")


def extract_archive(archive_path: str, target_dir: str) -> None:
    """Unpack zip/tar archives into ``target_dir``."""
    os.makedirs(target_dir, exist_ok=True)
    shutil.unpack_archive(archive_path, target_dir)


def save_cache(obj, path: str) -> None:
    """Pickle to disk (data_utils.py:24-28)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_cache(path: str):
    """Unpickle or None (data_utils.py:30-34)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
