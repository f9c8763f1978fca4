"""Minimal pure-numpy safetensors reader (no external deps).

The reference loads SD weights through diffusers/torch
(``ldiffusion.py:67``); this framework reads the same checkpoint directory
directly. The safetensors format is: u64 little-endian header length, JSON
header mapping tensor name -> {dtype, shape, data_offsets}, then raw bytes.
"""
from __future__ import annotations

import json
import struct
from typing import Dict

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """Decode bf16 (raw uint16) to float32 by left-shifting into the high bits."""
    u32 = raw.astype(np.uint32) << 16
    return u32.view(np.float32)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        data = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = data[start:end]
        dt = meta["dtype"]
        if dt == "BF16":
            arr = _bf16_to_f32(np.frombuffer(raw, np.uint16).copy())
        else:
            arr = np.frombuffer(raw, _DTYPES[dt]).copy()
        out[name] = arr.reshape(meta["shape"])
    return out


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Fallback for ``.bin`` checkpoints (requires torch, CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_bin(path)
