"""Environment-variable path/config resolution.

Behavioral contract: nnUNet's env-var layer (reference ``paths.py:21-39``:
``nnUNet_raw/preprocessed/results`` with warnings when unset;
``configuration.py:1-11``: ``nnUNet_def_n_proc``; ``nnunet_dataset.py:30-36``:
``nnUNet_keep_files_open``; ``nnUNetTrainer.py:228-229``: ``nnUNet_compile``).

TPU-native mapping: ``LDIFFUSION_*`` variables (legacy ``nnUNet_*`` names
are honored as fallbacks for drop-in familiarity); ``n_proc`` knobs are
retained for host-side IO pools even though augmentation runs on device.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional


def _env(*names: str, default: Optional[str] = None) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return default


def raw_dir(warn: bool = True) -> Optional[str]:
    v = _env("LDIFFUSION_RAW", "nnUNet_raw")
    if v is None and warn:
        warnings.warn("LDIFFUSION_RAW is not set; dataset materialization will "
                      "default to <work_dir>/seg_raw")
    return v


def preprocessed_dir(warn: bool = True) -> Optional[str]:
    v = _env("LDIFFUSION_PREPROCESSED", "nnUNet_preprocessed")
    if v is None and warn:
        warnings.warn("LDIFFUSION_PREPROCESSED is not set; preprocessed cases "
                      "stay in memory / under <work_dir>")
    return v


def results_dir(warn: bool = True) -> Optional[str]:
    v = _env("LDIFFUSION_RESULTS", "nnUNet_results")
    if v is None and warn:
        warnings.warn("LDIFFUSION_RESULTS is not set; checkpoints default to "
                      "<work_dir>/segmentor")
    return v


def default_num_processes() -> int:
    """reference ``configuration.py:5`` (nnUNet_def_n_proc, default 8)."""
    return int(_env("LDIFFUSION_N_PROC", "nnUNet_def_n_proc", default="8"))


def num_processes_da() -> int:
    """reference ``utilities/default_n_proc_DA.py`` (augmentation runs
    on-device here; this sizes the host prefetch only)."""
    return int(_env("LDIFFUSION_N_PROC_DA", "nnUNet_n_proc_DA", default="2"))


def use_compile_cache() -> bool:
    """Analog of ``nnUNet_compile`` — here it toggles the persistent XLA
    compile cache instead of torch.compile."""
    return _env("LDIFFUSION_COMPILE_CACHE", "nnUNet_compile", default="1") not in (
        "0", "false", "False")


def setup_compile_cache(repo_root: Optional[str] = None) -> None:
    if not use_compile_cache():
        return
    import jax

    root = repo_root or os.getcwd()
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
