"""Native (C++) runtime components, loaded via ctypes with lazy compilation.

The reference's input pipeline runs in batchgenerators CPU worker processes
(reference ``training/dataloading/base_data_loader.py``); the TPU-native
replacement keeps sampling on the host thread but pushes the hot crop+pad
batch assembly into a GIL-free multithreaded C++ routine
(``fast_patches.cpp``). The library is compiled on first use with the
toolchain's g++ and cached next to the source; every entry point has a
pure-numpy fallback, so the framework works (slower) without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_patches.cpp")
_SO = os.path.join(_HERE, "libfastpatches.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # compile to a pid-unique temp path: concurrent processes that both miss
    # the cache must not interleave writes into one .tmp before the atomic
    # publish (os.replace)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return _SO
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def load_library():
    """ctypes handle to the native library, or None (fallback mode)."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _build()
        if so is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.crop_with_pad_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),   # datas
                ctypes.POINTER(ctypes.c_void_p),   # segs
                ctypes.POINTER(ctypes.c_int64),    # shapes (B, nd)
                ctypes.POINTER(ctypes.c_int64),    # lbs (B, nd)
                ctypes.c_int64, ctypes.c_int64,    # B, nd
                ctypes.POINTER(ctypes.c_int64),    # patch (nd)
                ctypes.c_int64,                    # C
                ctypes.POINTER(ctypes.c_float),    # out_data
                ctypes.POINTER(ctypes.c_int16),    # out_seg
                ctypes.c_int64,                    # n_threads
            ]
            lib.crop_with_pad_batch.restype = None
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def crop_with_pad_batch_native(cases: Sequence[Tuple[np.ndarray, np.ndarray]],
                               lbs: np.ndarray, patch: Sequence[int],
                               n_threads: int = 4):
    """Batch crop+pad through the native library.

    cases: B (data (*spatial, C) float32 C-contiguous, seg (*spatial) int16)
    pairs; lbs: (B, nd) int64 lower bounds; patch: (nd).
    Returns (data (B, *patch, C) float32, seg (B, *patch) int16) or None when
    the native library is unavailable (callers fall back to numpy).
    """
    lib = load_library()
    if lib is None:
        return None
    B = len(cases)
    nd = len(patch)
    data_ptrs = (ctypes.c_void_p * B)()
    seg_ptrs = (ctypes.c_void_p * B)()
    shapes = np.empty((B, nd), np.int64)
    keepalive = []
    for b, (d, s) in enumerate(cases):
        assert d.dtype == np.float32 and d.flags.c_contiguous, (d.dtype, d.flags)
        assert s.dtype == np.int16 and s.flags.c_contiguous
        data_ptrs[b] = d.ctypes.data
        seg_ptrs[b] = s.ctypes.data
        shapes[b] = d.shape[:nd]
        keepalive.append((d, s))
    lbs = np.ascontiguousarray(lbs, np.int64)
    patch_arr = np.asarray(patch, np.int64)
    C = cases[0][0].shape[-1]
    out_data = np.empty((B, *patch, C), np.float32)
    out_seg = np.empty((B, *patch), np.int16)
    lib.crop_with_pad_batch(
        data_ptrs, seg_ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, nd,
        patch_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        C,
        out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n_threads,
    )
    return out_data, out_seg


def _bind_affine(lib):
    if getattr(lib, "_affine_bound", False):
        return
    lib.affine_augment_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),   # datas
        ctypes.POINTER(ctypes.c_void_p),   # segs
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,    # OH, OW (center-crop output)
        ctypes.POINTER(ctypes.c_double),   # angles
        ctypes.POINTER(ctypes.c_double),   # scales
        ctypes.POINTER(ctypes.c_uint8),    # apply flags
        ctypes.POINTER(ctypes.c_float),    # out_data
        ctypes.POINTER(ctypes.c_int16),    # out_seg
        ctypes.c_int64,                    # n_threads
        ctypes.c_int64,                    # data_order (1 bilinear, 0 nearest)
    ]
    lib.affine_augment_batch.restype = None
    lib._affine_bound = True


def affine_augment_batch_native(data: np.ndarray, seg: np.ndarray,
                                angles: np.ndarray, scales: np.ndarray,
                                apply: np.ndarray, n_threads: int = 4,
                                data_order: int = 1, out_size=None):
    """Host-side rotation+scale (the batchgenerators SpatialTransform analog;
    reference ``nnUNetTrainer.py:673-795`` runs it in CPU workers). Math
    matches ``data/augment.py:_affine_coords``: inverse map about the patch
    center, bilinear/zero-border data (nearest when ``data_order=0`` — the
    nnUNetTrainerDAOrd0 variant), nearest/zero-border seg.

    ``out_size=(OH, OW)`` computes only the centered OH×OW window of the
    output grid (== transform-then-center-crop, without interpolating the
    discarded border — the initial-patch-enlargement path).

    data: (B, H, W, C) float32 contiguous; seg: (B, H, W) int16 contiguous.
    Returns transformed copies, or None when the library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    _bind_affine(lib)
    B, H, W, C = data.shape
    OH, OW = (H, W) if out_size is None else map(int, out_size)
    assert 0 < OH <= H and 0 < OW <= W, (out_size, data.shape)
    assert data.dtype == np.float32 and data.flags.c_contiguous
    assert seg.dtype == np.int16 and seg.flags.c_contiguous
    data_ptrs = (ctypes.c_void_p * B)(*[
        data.ctypes.data + b * H * W * C * 4 for b in range(B)])
    seg_ptrs = (ctypes.c_void_p * B)(*[
        seg.ctypes.data + b * H * W * 2 for b in range(B)])
    angles = np.ascontiguousarray(angles, np.float64)
    scales = np.ascontiguousarray(scales, np.float64)
    apply = np.ascontiguousarray(apply, np.uint8)
    out_data = np.empty((B, OH, OW, C), data.dtype)
    out_seg = np.empty((B, OH, OW), seg.dtype)
    lib.affine_augment_batch(
        data_ptrs, seg_ptrs, B, H, W, C, OH, OW,
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        apply.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n_threads,
        data_order,
    )
    return out_data, out_seg


def affine_augment_batch_numpy(data, seg, angles, scales, apply,
                               data_order: int = 1, out_size=None):
    """Pure-numpy fallback implementing the same math (vectorized)."""
    B, H, W, C = data.shape
    OH, OW = (H, W) if out_size is None else map(int, out_size)
    offy, offx = (H - OH) // 2, (W - OW) // 2
    out_d = data[:, offy:offy + OH, offx:offx + OW].copy()
    out_s = seg[:, offy:offy + OH, offx:offx + OW].copy()
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = np.mgrid[:OH, :OW].astype(np.float64)
    y, x = yy + offy - cy, xx + offx - cx
    for b in range(B):
        if not apply[b]:
            continue
        cosv, sinv = np.cos(angles[b]), np.sin(angles[b])
        sy = (cosv * y + sinv * x) / scales[b] + cy
        sx = (-sinv * y + cosv * x) / scales[b] + cx
        # half-away-from-zero to match fast_patches.cpp's std::llround
        # (np.round is banker's rounding — disagrees on exact .5 ties)
        ry = np.trunc(sy + np.copysign(0.5, sy)).astype(np.int64)
        rx = np.trunc(sx + np.copysign(0.5, sx)).astype(np.int64)
        if data_order == 0:
            ok = (ry >= 0) & (ry < H) & (rx >= 0) & (rx < W)
            vals = data[b][np.clip(ry, 0, H - 1), np.clip(rx, 0, W - 1)]
            out_d[b] = np.where(ok[..., None], vals, 0.0).astype(np.float32)
        else:
            y0 = np.floor(sy).astype(np.int64)
            x0 = np.floor(sx).astype(np.int64)
            fy, fx = sy - y0, sx - x0
            acc = np.zeros((OH, OW, C), np.float64)
            for dy, dx, w in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                              (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
                yi, xi = y0 + dy, x0 + dx
                ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                vals = data[b][np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)]
                acc += (w * ok)[..., None] * vals
            out_d[b] = acc.astype(np.float32)
        ok = (ry >= 0) & (ry < H) & (rx >= 0) & (rx < W)
        out_s[b] = np.where(ok, seg[b][np.clip(ry, 0, H - 1),
                                       np.clip(rx, 0, W - 1)], 0).astype(seg.dtype)
    return out_d, out_s


def _bind_affine_3d(lib):
    if getattr(lib, "_affine3d_bound", False):
        return
    lib.affine_augment_batch_3d.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),   # datas
        ctypes.POINTER(ctypes.c_void_p),   # segs
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,                    # B, D, H, W, C
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # OD, OH, OW
        ctypes.POINTER(ctypes.c_double),   # angles_x
        ctypes.POINTER(ctypes.c_double),   # angles_y
        ctypes.POINTER(ctypes.c_double),   # angles_z
        ctypes.POINTER(ctypes.c_double),   # scales
        ctypes.POINTER(ctypes.c_uint8),    # apply flags
        ctypes.POINTER(ctypes.c_float),    # out_data
        ctypes.POINTER(ctypes.c_int16),    # out_seg
        ctypes.c_int64,                    # n_threads
        ctypes.c_int64,                    # data_order
    ]
    lib.affine_augment_batch_3d.restype = None
    lib._affine3d_bound = True


def affine_augment_batch_3d_native(data: np.ndarray, seg: np.ndarray,
                                   angles_x, angles_y, angles_z, scales,
                                   apply, n_threads: int = 4,
                                   data_order: int = 1, out_size=None):
    """Host-side 3D rotation(Euler Rx·Ry·Rz)+scale — the batchgenerators 3D
    SpatialTransform analog (reference ``nnUNetTrainer.py:673-795`` runs it
    in CPU workers). Trilinear/zero-border data, nearest/zero-border seg
    (RemoveLabelTransform(-1,0): outside trains as background).

    ``out_size=(OD, OH, OW)`` computes only the centered window of the
    output grid (transform-then-center-crop without the discarded border).

    data: (B, D, H, W, C) float32 contiguous; seg: (B, D, H, W) int16.
    Returns transformed copies, or None when the library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    _bind_affine_3d(lib)
    B, D, H, W, C = data.shape
    OD, OH, OW = (D, H, W) if out_size is None else map(int, out_size)
    assert 0 < OD <= D and 0 < OH <= H and 0 < OW <= W, (out_size, data.shape)
    assert data.dtype == np.float32 and data.flags.c_contiguous
    assert seg.dtype == np.int16 and seg.flags.c_contiguous
    img_bytes = D * H * W * C * 4
    seg_bytes = D * H * W * 2
    data_ptrs = (ctypes.c_void_p * B)(*[
        data.ctypes.data + b * img_bytes for b in range(B)])
    seg_ptrs = (ctypes.c_void_p * B)(*[
        seg.ctypes.data + b * seg_bytes for b in range(B)])
    ax = np.ascontiguousarray(angles_x, np.float64)
    ay = np.ascontiguousarray(angles_y, np.float64)
    az = np.ascontiguousarray(angles_z, np.float64)
    sc = np.ascontiguousarray(scales, np.float64)
    ap = np.ascontiguousarray(apply, np.uint8)
    out_data = np.empty((B, OD, OH, OW, C), data.dtype)
    out_seg = np.empty((B, OD, OH, OW), seg.dtype)
    lib.affine_augment_batch_3d(
        data_ptrs, seg_ptrs, B, D, H, W, C, OD, OH, OW,
        ax.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ay.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        az.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n_threads, data_order,
    )
    return out_data, out_seg


def affine_augment_batch_3d_numpy(data, seg, angles_x, angles_y, angles_z,
                                  scales, apply, data_order: int = 1,
                                  out_size=None):
    """Pure-numpy fallback with identical math (vectorized per volume)."""
    B, D, H, W, C = data.shape
    OD, OH, OW = (D, H, W) if out_size is None else map(int, out_size)
    offz, offy, offx = (D - OD) // 2, (H - OH) // 2, (W - OW) // 2
    out_d = data[:, offz:offz + OD, offy:offy + OH, offx:offx + OW].copy()
    out_s = seg[:, offz:offz + OD, offy:offy + OH, offx:offx + OW].copy()
    cz, cy, cx = (D - 1) / 2.0, (H - 1) / 2.0, (W - 1) / 2.0
    zz, yy, xx = np.mgrid[:OD, :OH, :OW].astype(np.float64)
    z, y, x = zz + offz - cz, yy + offy - cy, xx + offx - cx
    for b in range(B):
        if not apply[b]:
            continue
        cxr, sxr = np.cos(angles_x[b]), np.sin(angles_x[b])
        cyr, syr = np.cos(angles_y[b]), np.sin(angles_y[b])
        czr, szr = np.cos(angles_z[b]), np.sin(angles_z[b])
        r00, r01, r02 = cyr * czr, -cyr * szr, syr
        r10 = cxr * szr + sxr * syr * czr
        r11 = cxr * czr - sxr * syr * szr
        r12 = -sxr * cyr
        r20 = sxr * szr - cxr * syr * czr
        r21 = sxr * czr + cxr * syr * szr
        r22 = cxr * cyr
        inv_s = 1.0 / scales[b]
        sz = (r00 * z + r10 * y + r20 * x) * inv_s + cz
        sy = (r01 * z + r11 * y + r21 * x) * inv_s + cy
        sx = (r02 * z + r12 * y + r22 * x) * inv_s + cx
        # half-away-from-zero to match fast_patches.cpp's std::llround
        rz = np.trunc(sz + np.copysign(0.5, sz)).astype(np.int64)
        ry = np.trunc(sy + np.copysign(0.5, sy)).astype(np.int64)
        rx = np.trunc(sx + np.copysign(0.5, sx)).astype(np.int64)
        rin = ((rz >= 0) & (rz < D) & (ry >= 0) & (ry < H)
               & (rx >= 0) & (rx < W))
        if data_order == 0:
            vals = data[b][np.clip(rz, 0, D - 1), np.clip(ry, 0, H - 1),
                           np.clip(rx, 0, W - 1)]
            out_d[b] = np.where(rin[..., None], vals, 0.0).astype(np.float32)
        else:
            z0 = np.floor(sz).astype(np.int64)
            y0 = np.floor(sy).astype(np.int64)
            x0 = np.floor(sx).astype(np.int64)
            fz, fy, fx = sz - z0, sy - y0, sx - x0
            acc = np.zeros((OD, OH, OW, C), np.float64)
            for dz in (0, 1):
                wz = fz if dz else 1.0 - fz
                zi = z0 + dz
                okz = (zi >= 0) & (zi < D)
                for dy in (0, 1):
                    wy = fy if dy else 1.0 - fy
                    yi = y0 + dy
                    oky = okz & (yi >= 0) & (yi < H)
                    for dx in (0, 1):
                        wx = fx if dx else 1.0 - fx
                        xi = x0 + dx
                        ok = oky & (xi >= 0) & (xi < W)
                        vals = data[b][np.clip(zi, 0, D - 1),
                                       np.clip(yi, 0, H - 1),
                                       np.clip(xi, 0, W - 1)]
                        acc += (wz * wy * wx * ok)[..., None] * vals
            out_d[b] = acc.astype(np.float32)
        out_s[b] = np.where(rin, seg[b][np.clip(rz, 0, D - 1),
                                        np.clip(ry, 0, H - 1),
                                        np.clip(rx, 0, W - 1)], 0
                            ).astype(seg.dtype)
    return out_d, out_s
