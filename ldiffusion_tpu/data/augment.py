"""Device-side data augmentation (the nnUNet DA stack, on-TPU).

Behavioral contract: the training transforms built by the reference trainer
(``nnUNetTrainer.py:673-795`` via batchgenerators): spatial rotation ±180° /
scaling 0.7–1.4 (p=0.2 each), Gaussian noise (p=0.1), Gaussian blur σ 0.5–1
(p=0.2, per-channel p=0.5), multiplicative brightness 0.75–1.25 (p=0.15),
contrast 0.75–1.25 (p=0.15), simulated low-resolution 0.5–1× (p=0.25),
gamma 0.7–1.5 inverted (p=0.1) and plain (p=0.3), mirroring (p=0.5/axis).

TPU-first: the reference runs these in a pool of CPU worker processes
(``LimitedLenWrapper``); here the whole stack is one jitted, vmapped pure
function of a PRNG key — it fuses into the training step's input path and
needs no host workers. Probabilistic branches are computed as lax selects
(both paths evaluated) — negligible next to the UNet fwd/bwd.

Deviations (documented): low-res simulation uses quantized-coordinate
bilinear resampling (order 0 down / order 1 up vs the reference's order 3
up); elastic deformation is off (nnUNetv2 default: do_elastic=False).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    p_rotation: float = 0.2
    p_scaling: float = 0.2
    rotation_max: float = 3.141592653589793  # ±180°
    scale_range: tuple = (0.7, 1.4)
    p_noise: float = 0.1
    noise_var_max: float = 0.1
    p_blur: float = 0.2
    blur_sigma: tuple = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: tuple = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: tuple = (0.75, 1.25)
    p_lowres: float = 0.25
    lowres_zoom: tuple = (0.5, 1.0)
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: tuple = (0.7, 1.5)
    p_mirror: float = 0.5
    # spatial axes eligible for mirroring (reference mirror_axes; the
    # nnUNetTrainer_onlyMirror01 variant restricts to the first two) — 2D
    # patches use axes 0/1 regardless, 3D honors the restriction
    mirror_axes: tuple = (0, 1, 2)
    # 3D per-axis rotation bound (reference
    # configure_rotation_dummyDA_mirroring: quasi-isotropic 3D patches rotate
    # ±30° about each axis)
    rotation_max_3d: float = 0.5235987755982988  # pi/6


def _affine_coords(h, w, angle, scale):
    """Rotation+scale about the patch center → sample coordinates (2,H,W)."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y, x = yy - cy, xx - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse map: output→input, divide by scale, rotate by -angle
    sy = (cos * y + sin * x) / scale + cy
    sx = (-sin * y + cos * x) / scale + cx
    return sy, sx


def _bilinear_sample(img, sy, sx, order):
    """img: (H, W, C); order 1 bilinear or 0 nearest."""
    return jnp.stack(
        [
            jax.scipy.ndimage.map_coordinates(img[..., c], [sy, sx], order=order,
                                              mode="constant", cval=0.0)
            for c in range(img.shape[-1])
        ],
        axis=-1,
    )


def _gauss_kernel(sigma, radius: int = 3):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img, sigma):
    """Separable 7-tap gaussian blur (shift-and-add; XLA fuses it)."""
    k = _gauss_kernel(sigma)

    def conv1d(x, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (3, 3)
        xp = jnp.pad(x, pad, mode="edge")
        return _manual_conv(xp, k, axis)

    return conv1d(conv1d(img, 0), 1)


def _manual_conv(xp, k, axis):
    """Shift-and-add separable convolution (7 taps) — fuses trivially."""
    r = 3
    out = jnp.zeros_like(xp)
    for i in range(2 * r + 1):
        out = out + k[i] * jnp.roll(xp, r - i, axis=axis)
    if axis == 0:
        return out[r:-r]
    return out[:, r:-r]


def _gamma(img, gamma, invert):
    x = jnp.where(invert, -img, img)
    mn = jnp.min(x)
    rng_ = jnp.max(x) - mn + 1e-7
    x = jnp.power((x - mn) / rng_, gamma) * rng_ + mn
    return jnp.where(invert, -x, x)


def _augment_one(key, data, seg, cfg: AugmentConfig):
    """data: (H, W, C) float32; seg: (H, W) int32.

    Transforms with probability 0 are omitted at TRACE time (static python
    guards on the static cfg): ``jnp.where`` evaluates both branches, so
    without the guards a disabled transform still paid its full compute —
    the affine gather in particular."""
    h, w = data.shape[:2]
    ks = jax.random.split(key, 16)
    u = jax.random.uniform(ks[0], (12,))

    # ---- spatial (rotation + scale, one resample) ----
    if cfg.p_rotation > 0 or cfg.p_scaling > 0:
        angle = jnp.where(u[0] < cfg.p_rotation,
                          jax.random.uniform(ks[1], (), minval=-cfg.rotation_max,
                                             maxval=cfg.rotation_max), 0.0)
        scale = jnp.where(u[1] < cfg.p_scaling,
                          jax.random.uniform(ks[2], (), minval=cfg.scale_range[0],
                                             maxval=cfg.scale_range[1]), 1.0)
        do_spatial = (u[0] < cfg.p_rotation) | (u[1] < cfg.p_scaling)
        sy, sx = _affine_coords(h, w, angle, scale)
        data = jnp.where(do_spatial, _bilinear_sample(data, sy, sx, 1), data)
        seg_s = _bilinear_sample(seg[..., None].astype(jnp.float32), sy, sx, 0)[..., 0]
        seg = jnp.where(do_spatial, seg_s.astype(seg.dtype), seg)

    # ---- gaussian noise ----
    if cfg.p_noise > 0:
        var = jax.random.uniform(ks[3], (), maxval=cfg.noise_var_max)
        noise = jax.random.normal(ks[4], data.shape) * jnp.sqrt(var)
        data = jnp.where(u[2] < cfg.p_noise, data + noise, data)

    # ---- gaussian blur ----
    if cfg.p_blur > 0:
        sigma = jax.random.uniform(ks[5], (), minval=cfg.blur_sigma[0],
                                   maxval=cfg.blur_sigma[1])
        data = jnp.where(u[3] < cfg.p_blur, _blur(data, sigma), data)

    # ---- brightness (multiplicative) ----
    if cfg.p_brightness > 0:
        b = jax.random.uniform(ks[6], (), minval=cfg.brightness_range[0],
                               maxval=cfg.brightness_range[1])
        data = jnp.where(u[4] < cfg.p_brightness, data * b, data)

    # ---- contrast (preserve mean) ----
    if cfg.p_contrast > 0:
        c = jax.random.uniform(ks[7], (), minval=cfg.contrast_range[0],
                               maxval=cfg.contrast_range[1])
        mean = jnp.mean(data, axis=(0, 1), keepdims=True)
        data = jnp.where(u[5] < cfg.p_contrast, (data - mean) * c + mean, data)

    # ---- simulated low-res ----
    # Pool-based (reshape mean-pool + nearest upsample) with factor ∈ {2, 4}
    # instead of the reference's continuous-zoom gather resample: gathers at
    # full resolution cost more than the UNet fwd on TPU, while reshape
    # pooling is pure data movement. Documented deviation (zoom quantized).
    def lowres(factor):
        hh, ww, c = data.shape
        pooled = data.reshape(hh // factor, factor, ww // factor, factor, c).mean((1, 3))
        return jnp.repeat(jnp.repeat(pooled, factor, 0), factor, 1)

    if cfg.p_lowres > 0:
        factor4 = jax.random.uniform(ks[8], ()) < 0.5
        low = jnp.where(factor4, lowres(4), lowres(2)) if h % 4 == 0 and w % 4 == 0 \
            else data
        data = jnp.where(u[6] < cfg.p_lowres, low, data)

    # ---- gamma ----
    if cfg.p_gamma_invert > 0:
        g = jax.random.uniform(ks[9], (), minval=cfg.gamma_range[0],
                               maxval=cfg.gamma_range[1])
        data = jnp.where(u[7] < cfg.p_gamma_invert, _gamma(data, g, True), data)
    if cfg.p_gamma > 0:
        g2 = jax.random.uniform(ks[10], (), minval=cfg.gamma_range[0],
                                maxval=cfg.gamma_range[1])
        data = jnp.where(u[8] < cfg.p_gamma, _gamma(data, g2, False), data)

    # ---- mirroring ----
    if cfg.p_mirror > 0:
        if 0 in cfg.mirror_axes:
            data = jnp.where(u[9] < cfg.p_mirror, data[::-1], data)
            seg = jnp.where(u[9] < cfg.p_mirror, seg[::-1], seg)
        if 1 in cfg.mirror_axes:
            data = jnp.where(u[10] < cfg.p_mirror, data[:, ::-1], data)
            seg = jnp.where(u[10] < cfg.p_mirror, seg[:, ::-1], seg)
    return data, seg


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key, data, seg, cfg: AugmentConfig = AugmentConfig()):
    """data: (B, H, W, C); seg: (B, H, W) (-1 padding preserved through
    nearest spatial resampling)."""
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: _augment_one(k, d, s, cfg))(keys, data, seg)


def augment_batch_3d(key, data, seg, cfg: AugmentConfig = AugmentConfig()):
    """3D DEVICE DA: per-axis mirroring + gaussian noise (jitted).

    Rotation/scale for volumes run on the HOST (``HostSpatialAugmenter3D`` →
    native C++ trilinear resample in the prefetch thread, wired by
    ``SegmentorTrainer``), mirroring the reference's CPU-worker
    SpatialTransform — full 3D resampling on-device costs more than the UNet
    step at typical patch sizes. data: (B, Z, H, W, C); seg: (B, Z, H, W)."""
    def one(k, d, s):
        ks = jax.random.split(k, 5)
        for ax, kk in zip(range(3), ks[:3]):
            if ax not in cfg.mirror_axes:
                continue  # onlyMirror01-style axis restriction (static)
            flip = jax.random.bernoulli(kk, cfg.p_mirror)
            d = jnp.where(flip, jnp.flip(d, axis=ax), d)
            s = jnp.where(flip, jnp.flip(s, axis=ax), s)
        if cfg.p_noise > 0:
            ks2 = jax.random.split(ks[3], 3)
            do = jax.random.bernoulli(ks2[0], cfg.p_noise)
            var = jax.random.uniform(ks2[1], (), minval=0.0,
                                     maxval=cfg.noise_var_max)
            d = d + do * jax.random.normal(ks2[2], d.shape, d.dtype) * jnp.sqrt(var)
        return d, s

    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(one)(keys, data, seg)


class HostSpatialAugmenter:
    """Host-side rotation+scale, applied in the prefetch thread.

    The device-side affine resample is a 1M-index gather per channel that
    profiled at ~97% of the whole DA stack and more than the UNet fwd at
    1024² (BASELINE.md round 2); the reference runs SpatialTransform on CPU
    workers anyway (``nnUNetTrainer.py:673-795`` via batchgenerators), so
    the faithful AND fast design is the native multithreaded C++ resample
    (``ldiffusion_tpu/native``), overlapped with device compute by the
    prefetcher. Pair with a device AugmentConfig whose spatial probabilities
    are zeroed (``SegmentorTrainer`` does this automatically)."""

    def __init__(self, cfg: AugmentConfig, seed: int = 0, n_threads: int = 4,
                 data_order: int = 1):
        import numpy as np

        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.n_threads = n_threads
        # 0 = nearest data resampling (nnUNetTrainerDAOrd0's
        # order_resampling_data=0); 1 = bilinear (default)
        self.data_order = data_order

    def __call__(self, data, seg):
        import numpy as np

        from ldiffusion_tpu.native import (
            affine_augment_batch_native,
            affine_augment_batch_numpy,
        )

        cfg = self.cfg
        B = data.shape[0]
        u = self.rng.random((B, 2))
        rot = u[:, 0] < cfg.p_rotation
        sc = u[:, 1] < cfg.p_scaling
        apply = rot | sc
        if not apply.any():
            return data, seg
        angles = np.where(rot, self.rng.uniform(-cfg.rotation_max,
                                                cfg.rotation_max, B), 0.0)
        scales = np.where(sc, self.rng.uniform(cfg.scale_range[0],
                                               cfg.scale_range[1], B), 1.0)
        data = np.ascontiguousarray(data, np.float32)
        seg16 = np.ascontiguousarray(seg, np.int16)
        out = affine_augment_batch_native(data, seg16, angles, scales, apply,
                                          n_threads=self.n_threads,
                                          data_order=self.data_order)
        if out is None:
            out = affine_augment_batch_numpy(data, seg16, angles, scales, apply,
                                             data_order=self.data_order)
        d, s = out
        return d, s.astype(seg.dtype)


class HostSpatialAugmenter3D:
    """Host-side 3D rotation+scale in the prefetch thread (the
    batchgenerators 3D SpatialTransform analog — the reference rotates
    volumes ±30° per axis in CPU workers, ``nnUNetTrainer.py:673-795``;
    closing the r2 "3D spatial DA omitted" deviation). Native multithreaded
    C++ trilinear resample (``ldiffusion_tpu/native``) with a numpy
    fallback; pair with a device AugmentConfig whose spatial probabilities
    are zeroed (``SegmentorTrainer`` does this automatically)."""

    def __init__(self, cfg: AugmentConfig, seed: int = 0, n_threads: int = 4,
                 data_order: int = 1):
        import numpy as np

        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.n_threads = n_threads
        self.data_order = data_order

    def __call__(self, data, seg):
        import numpy as np

        from ldiffusion_tpu.native import (
            affine_augment_batch_3d_native,
            affine_augment_batch_3d_numpy,
        )

        cfg = self.cfg
        B = data.shape[0]
        u = self.rng.random((B, 2))
        rot = u[:, 0] < cfg.p_rotation
        sc = u[:, 1] < cfg.p_scaling
        apply = rot | sc
        if not apply.any():
            return data, seg
        rmax = cfg.rotation_max_3d
        ax = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        ay = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        az = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        scales = np.where(sc, self.rng.uniform(cfg.scale_range[0],
                                               cfg.scale_range[1], B), 1.0)
        data = np.ascontiguousarray(data, np.float32)
        seg16 = np.ascontiguousarray(seg, np.int16)
        out = affine_augment_batch_3d_native(
            data, seg16, ax, ay, az, scales, apply,
            n_threads=self.n_threads, data_order=self.data_order)
        if out is None:
            out = affine_augment_batch_3d_numpy(
                data, seg16, ax, ay, az, scales, apply,
                data_order=self.data_order)
        d, s = out
        return d, s.astype(seg.dtype)
