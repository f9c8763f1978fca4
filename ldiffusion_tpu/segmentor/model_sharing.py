"""Export / import trained segmentor models as zip archives.

Behavioral contract: nnUNet's model_sharing (reference
``model_sharing/model_export.py`` / ``model_import.py`` / ``entry_points``,
~350 LoC): bundle plans + checkpoints (+ postprocessing) into a portable zip;
import extracts into the results tree.
"""
from __future__ import annotations

import os
import zipfile
from typing import Optional, Sequence

EXPORT_FILES = ("plans.json", "checkpoint_best.pkl", "checkpoint_final.pkl",
                "checkpoint_latest.pkl", "postprocessing.json", "debug.json",
                "progress.png", "training_log.txt")


def export_model(model_dir: str, zip_path: str,
                 extra_files: Optional[Sequence[str]] = None) -> str:
    files = [f for f in EXPORT_FILES if os.path.exists(os.path.join(model_dir, f))]
    assert "plans.json" in files, f"{model_dir} has no plans.json"
    assert any(f.startswith("checkpoint") for f in files), "no checkpoint to export"
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files + list(extra_files or []):
            z.write(os.path.join(model_dir, f), arcname=f)
    return zip_path


def import_model(zip_path: str, target_dir: str) -> str:
    os.makedirs(target_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
        assert "plans.json" in names, "not a valid exported model (no plans.json)"
        z.extractall(target_dir)
    return target_dir


def download_file(url: str, local_filename: str,
                  chunk_size: int = 8192 * 16) -> str:
    """Stream a URL to a local file (reference
    ``model_sharing/model_download.py:37-46``). Uses urllib instead of
    requests; ``file://`` URLs work too, which is also how the offline test
    exercises this path (this environment has no egress)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=100) as r, open(local_filename, "wb") as f:
        while True:
            chunk = r.read(chunk_size)
            if not chunk:
                break
            f.write(chunk)
    return local_filename


def download_and_install_from_url(url: str, target_dir: str) -> str:
    """Download a model zip and install it into the results tree (reference
    ``model_sharing/model_download.py:11-34``: temp file in $HOME, install,
    always remove the temp)."""
    import time

    tempfile_path = os.path.join(os.path.expanduser("~"),
                                 f".lddownload_{int(time.time() * 1e7)}")
    try:
        download_file(url, tempfile_path)
        return import_model(tempfile_path, target_dir)
    finally:
        if os.path.isfile(tempfile_path):
            os.remove(tempfile_path)
