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
    # DA5 photometric modes (reference nnUNetTrainerDA5.py:178-219):
    # brightness becomes an ADDITIVE per-channel N(0, sigma) offset
    # (BrightnessTransform(0, 0.5)) instead of the default multiplicative
    # scale; contrast clips back to the original per-channel range half the
    # time (OneOf preserve_range True/False); the second gamma transform is
    # ALSO inverted (DA5 appends GammaTransform(invert_image=True) twice).
    brightness_additive_sigma: float = 0.0  # 0 = multiplicative mode
    contrast_clip_half: bool = False
    gamma2_invert: bool = False
    # DA5's distinctive transforms (reference nnUNetTrainerDA5.py:149-264),
    # all default-off so the standard stack traces unchanged:
    # Rot90Transform((0,1,2,3), p=0.5) / TransposeAxesTransform(p=0.5) —
    # only engaged for square patches (the reference guards on
    # matching_axes > 1)
    p_rot90: float = 0.0
    p_transpose: float = 0.0
    # OneOf(MedianFilter((2,8)) | GaussianBlur): when p_median > 0, a fair
    # coin picks median-vs-blur per sample and each then engages with its
    # own p. Median kernel sizes quantize to {3, 5, 7} (static shapes under
    # jit; the reference samples ints from [2, 8]) — documented deviation.
    p_median: float = 0.0
    # BlankRectangleTransform([p//10, p//3] per axis, value=mean of the
    # covered region, num_rectangles=(1,5), p_per_channel=0.5)
    p_blank_rect: float = 0.0
    # BrightnessGradientAdditiveTransform(scale=exp U(log(p/6), log p),
    # loc=(-0.5,1.5), strength=±U(1,5)) — one gaussian kernel per sample,
    # per-channel engage 0.5 (the reference resamples the kernel per channel;
    # shared-kernel + per-channel strength documented deviation)
    p_brightness_gradient: float = 0.0
    # LocalGammaTransform(same kernel family, gamma=U(0.01,0.8)|U(1.5,4))
    p_local_gamma: float = 0.0
    # SharpeningTransform(strength=(0.1,1)): unsharp via the 4-neighbor
    # laplacian, result clipped to the original per-channel range
    p_sharpen: float = 0.0
    sharpen_strength: tuple = (0.1, 1.0)
    # 3D per-axis rotation bound (reference
    # configure_rotation_dummyDA_mirroring: quasi-isotropic 3D patches rotate
    # ±30° about each axis)
    rotation_max_3d: float = 0.5235987755982988  # pi/6
    # scale range fed into the INITIAL-patch-size formula. None → the
    # reference's legacy (0.85, 1.25) ("doesn't even use the correct scale
    # range", nnUNetTrainer.py:419-421); DA5 passes its true (0.7, 1.43)
    # (nnUNetTrainerDA5.py:82-84).
    initial_scale_range: tuple = None


# ---------------------------------------------------------------------------
# spatial-DA configuration (rotation ranges / dummy-2D / initial patch size)
# ---------------------------------------------------------------------------

ANISO_THRESHOLD = 3.0  # reference configuration.py:7


@dataclasses.dataclass(frozen=True)
class SpatialDAPlan:
    """Output of ``configure_spatial_da`` (the reference's
    ``configure_rotation_dummyDA_mirroring_and_inital_patch_size`` tuple,
    ``nnUNetTrainer.py:375-431``)."""

    rotation_max: tuple        # per-axis max |angle| in radians (x, y, z)
    do_dummy_2d: bool
    initial_patch_size: tuple  # sample at this size, center-crop to final
    mirror_axes: tuple


def _rotated_extent(coords, axis_matrix):
    import numpy as np

    return np.abs(np.asarray(coords, np.float64) @ axis_matrix)


def get_initial_patch_size(final_patch_size, rot_x, rot_y, rot_z,
                           scale_range) -> tuple:
    """Patch size to SAMPLE so that rotation + zoom-out still see real
    content at the final patch's corners (reference
    ``data_augmentation/compute_initial_patch_size.py:get_patch_size``:
    rotate the extent vector by each single-axis max rotation — row-vector
    convention — take the componentwise max, divide by min scale).

    The formula underestimates the true rotated bounding box (it rotates the
    extent VECTOR, not the corners) — reproduced as-is for parity; the
    remaining corner pixels stay padded exactly like the reference's."""
    import numpy as np

    def _max_abs(r):
        if isinstance(r, (tuple, list)):
            r = max(abs(float(v)) for v in r)
        return min(np.pi / 2, abs(float(r)))

    rx, ry, rz = _max_abs(rot_x), _max_abs(rot_y), _max_abs(rot_z)
    coords = np.asarray(final_patch_size, np.float64)
    final = coords.copy()
    if len(coords) == 3:
        for axis, ang in ((0, rx), (1, ry), (2, rz)):
            c, s = np.cos(ang), np.sin(ang)
            m = np.eye(3)
            other = [i for i in range(3) if i != axis]
            m[other[0], other[0]] = c
            m[other[0], other[1]] = s if axis == 1 else -s
            m[other[1], other[0]] = -s if axis == 1 else s
            m[other[1], other[1]] = c
            final = np.maximum(final, _rotated_extent(coords, m))
    elif len(coords) == 2:
        c, s = np.cos(rx), np.sin(rx)
        m = np.array([[c, -s], [s, c]])
        final = np.maximum(final, _rotated_extent(coords, m))
    final = final / min(scale_range)
    return tuple(int(v) for v in final)


def configure_spatial_da(patch_size,
                         initial_scale_range=None) -> SpatialDAPlan:
    """Rotation ranges, dummy-2D decision, initial patch size and mirror
    axes from the patch geometry (reference ``nnUNetTrainer.py:375-431``):

    * 2D: aspect ratio > 1.5 → rotation ±15°, else ±180°; mirror (0, 1).
    * 3D: ``max(patch)/patch[0] > ANISO_THRESHOLD`` → dummy-2D DA (in-plane
      ±180° only, out-of-plane axis untouched), else ±30° per axis;
      mirror (0, 1, 2).
    * initial patch = ``get_initial_patch_size(...)`` with the legacy
      (0.85, 1.25) scale range unless overridden (DA5: (0.7, 1.43));
      dummy-2D keeps the out-of-plane extent unchanged.
    """
    import numpy as np

    patch_size = tuple(int(p) for p in patch_size)
    dim = len(patch_size)
    scale = tuple(initial_scale_range or (0.85, 1.25))
    if dim == 2:
        do_dummy = False
        rot = np.pi / 12 if max(patch_size) / min(patch_size) > 1.5 else np.pi
        rotation = (rot, 0.0, 0.0)
        mirror_axes = (0, 1)
    elif dim == 3:
        do_dummy = (max(patch_size) / patch_size[0]) > ANISO_THRESHOLD
        rotation = (np.pi, 0.0, 0.0) if do_dummy \
            else (np.pi / 6, np.pi / 6, np.pi / 6)
        mirror_axes = (0, 1, 2)
    else:
        raise ValueError(f"patch rank {dim}")
    initial = get_initial_patch_size(patch_size[-dim:], *rotation, scale)
    if do_dummy:
        initial = (patch_size[0], *initial[1:])
    return SpatialDAPlan(rotation_max=rotation, do_dummy_2d=do_dummy,
                         initial_patch_size=initial, mirror_axes=mirror_axes)


def center_crop_batch(data, seg, final_patch):
    """Center-crop (B, *spatial, C) / (B, *spatial) to ``final_patch`` —
    the reference SpatialTransform's random_crop=False output crop."""
    nd = len(final_patch)
    spatial = data.shape[1:1 + nd]
    sl = [slice(None)]
    for ax in range(nd):
        off = (spatial[ax] - final_patch[ax]) // 2
        assert off >= 0, (spatial, final_patch)
        sl.append(slice(off, off + final_patch[ax]))
    sl = tuple(sl)
    return data[sl], seg[sl]


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


def _median_filter(img, size: int):
    """k×k median per channel via shift-and-sort (static k). img: (H,W,C).

    Edge-replicate padded so borders never wrap around to the opposite edge
    (scipy's MedianFilterTransform uses reflect borders; edge replication is
    the same convention as ``_blur``/``_laplacian`` here)."""
    r = size // 2
    xp = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    shifts = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifts.append(jnp.roll(jnp.roll(xp, dy, 0), dx, 1))
    stack = jnp.stack(shifts, 0)[:, r:-r, r:-r]
    return jnp.sort(stack, axis=0)[len(shifts) // 2]


def _local_gaussian_kernel(key, h, w):
    """Max-normalized separable gaussian bump with the DA5 parameterization:
    per-dim sigma ~ exp U(log(d/6), log d), center ~ U(-0.5, 1.5)·d (can sit
    outside the patch) — reference nnUNetTrainerDA5.py:357-358 scale callable
    + loc=(-0.5, 1.5) of BrightnessGradientAdditive/LocalGamma."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sy = jnp.exp(jax.random.uniform(k1, (), minval=jnp.log(max(h / 6.0, 1.0)),
                                    maxval=jnp.log(float(h))))
    sx = jnp.exp(jax.random.uniform(k2, (), minval=jnp.log(max(w / 6.0, 1.0)),
                                    maxval=jnp.log(float(w))))
    my = jax.random.uniform(k3, (), minval=-0.5, maxval=1.5) * h
    mx = jax.random.uniform(k4, (), minval=-0.5, maxval=1.5) * w
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    kern = jnp.exp(-0.5 * ((yy - my) / sy) ** 2) \
        * jnp.exp(-0.5 * ((xx - mx) / sx) ** 2)
    return kern / (jnp.max(kern) + 1e-8)


def _laplacian(img):
    """4-neighbor laplacian with edge replication. img: (H,W,C)."""
    up = jnp.concatenate([img[:1], img[:-1]], 0)
    dn = jnp.concatenate([img[1:], img[-1:]], 0)
    lf = jnp.concatenate([img[:, :1], img[:, :-1]], 1)
    rt = jnp.concatenate([img[:, 1:], img[:, -1:]], 1)
    return 4.0 * img - up - dn - lf - rt


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
    # DA5 additions draw from their own key block so the standard stack's
    # sampling stream is untouched (ks[13..15] were unused)
    ks5 = jax.random.split(ks[13], 12)
    u5 = jax.random.uniform(ks[14], (8,))

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

    # ---- rot90 / transpose (DA5, square patches only) ----
    # Rot90Transform((0,1,2,3), p=0.5) + TransposeAxesTransform(p=0.5)
    # (reference nnUNetTrainerDA5.py:149-159, guarded on matching_axes > 1 —
    # h == w is the 2D equivalent, static at trace time)
    if cfg.p_rot90 > 0 and h == w:
        kk = jax.random.randint(ks5[0], (), 0, 4)
        rot_d = jax.lax.switch(kk, [lambda x, k=k: jnp.rot90(x, k)
                                    for k in range(4)], data)
        rot_s = jax.lax.switch(kk, [lambda x, k=k: jnp.rot90(x, k)
                                    for k in range(4)], seg)
        do = u5[0] < cfg.p_rot90
        data = jnp.where(do, rot_d, data)
        seg = jnp.where(do, rot_s, seg)
    if cfg.p_transpose > 0 and h == w:
        do = u5[1] < cfg.p_transpose
        data = jnp.where(do, jnp.swapaxes(data, 0, 1), data)
        seg = jnp.where(do, jnp.swapaxes(seg, 0, 1), seg)

    # ---- gaussian noise ----
    if cfg.p_noise > 0:
        var = jax.random.uniform(ks[3], (), maxval=cfg.noise_var_max)
        noise = jax.random.normal(ks[4], data.shape) * jnp.sqrt(var)
        data = jnp.where(u[2] < cfg.p_noise, data + noise, data)

    # ---- gaussian blur (optionally OneOf'd with a median filter) ----
    if cfg.p_blur > 0 or cfg.p_median > 0:
        # DA5's OneOf(MedianFilter | GaussianBlur) (reference
        # nnUNetTrainerDA5.py:161-172): a fair coin picks the member, which
        # then engages with its own p — the two are mutually exclusive
        pick_median = jax.random.bernoulli(ks5[2], 0.5) \
            if cfg.p_median > 0 else False
        if cfg.p_blur > 0:
            sigma = jax.random.uniform(ks[5], (), minval=cfg.blur_sigma[0],
                                       maxval=cfg.blur_sigma[1])
            do_blur = u[3] < cfg.p_blur
            if cfg.p_median > 0:
                do_blur = do_blur & ~pick_median
            data = jnp.where(do_blur, _blur(data, sigma), data)
        if cfg.p_median > 0:
            sz = jax.random.randint(ks5[3], (), 0, 3)
            med = jax.lax.switch(sz, [lambda x: _median_filter(x, 3),
                                      lambda x: _median_filter(x, 5),
                                      lambda x: _median_filter(x, 7)], data)
            data = jnp.where(pick_median & (u5[2] < cfg.p_median), med, data)

    # ---- brightness ----
    if cfg.p_brightness > 0:
        if cfg.brightness_additive_sigma > 0:
            # DA5: additive per-channel N(0, sigma) offset with per-channel
            # p 0.5 (reference BrightnessTransform(0, 0.5, per_channel=True,
            # p_per_channel=0.5))
            nch = data.shape[-1]
            shift = jax.random.normal(ks[6], (nch,)) * cfg.brightness_additive_sigma
            chan_on = jax.random.bernoulli(ks[11], 0.5, (nch,))
            data = jnp.where(u[4] < cfg.p_brightness,
                             data + shift * chan_on, data)
        else:
            b = jax.random.uniform(ks[6], (), minval=cfg.brightness_range[0],
                                   maxval=cfg.brightness_range[1])
            data = jnp.where(u[4] < cfg.p_brightness, data * b, data)

    # ---- contrast (preserve mean) ----
    if cfg.p_contrast > 0:
        c = jax.random.uniform(ks[7], (), minval=cfg.contrast_range[0],
                               maxval=cfg.contrast_range[1])
        mean = jnp.mean(data, axis=(0, 1), keepdims=True)
        res = (data - mean) * c + mean
        if cfg.contrast_clip_half:
            # DA5's OneOf(preserve_range=True | False): half the time the
            # result clips back to the original per-channel min/max
            mn = jnp.min(data, axis=(0, 1), keepdims=True)
            mx = jnp.max(data, axis=(0, 1), keepdims=True)
            res = jnp.where(jax.random.bernoulli(ks[12], 0.5),
                            jnp.clip(res, mn, mx), res)
        data = jnp.where(u[5] < cfg.p_contrast, res, data)

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
        data = jnp.where(u[8] < cfg.p_gamma,
                        _gamma(data, g2, cfg.gamma2_invert), data)

    # ---- mirroring ----
    if cfg.p_mirror > 0:
        if 0 in cfg.mirror_axes:
            data = jnp.where(u[9] < cfg.p_mirror, data[::-1], data)
            seg = jnp.where(u[9] < cfg.p_mirror, seg[::-1], seg)
        if 1 in cfg.mirror_axes:
            data = jnp.where(u[10] < cfg.p_mirror, data[:, ::-1], data)
            seg = jnp.where(u[10] < cfg.p_mirror, seg[:, ::-1], seg)

    # ---- DA5 tail: blank rectangles, brightness gradient, local gamma,
    # sharpening (reference nnUNetTrainerDA5.py:224-264, applied after
    # MirrorTransform in the reference's order) ----
    if cfg.p_blank_rect > 0:
        # BlankRectangleTransform([p//10, p//3] per axis, value = mean of
        # the covered region, num_rectangles=(1,5), p_per_channel=0.5)
        nch = data.shape[-1]
        krs = jax.random.split(ks5[4], 5)
        n_rect = jax.random.randint(ks5[5], (), 1, 6)
        chan_on = jax.random.bernoulli(ks5[6], 0.5, (nch,))
        do_blank = (u5[3] < cfg.p_blank_rect)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        for slot in range(5):
            k1, k2, k3, k4 = jax.random.split(krs[slot], 4)
            rh = jax.random.randint(k1, (), max(1, h // 10), max(2, h // 3 + 1))
            rw = jax.random.randint(k2, (), max(1, w // 10), max(2, w // 3 + 1))
            y0 = jax.random.randint(k3, (), 0, h)
            x0 = jax.random.randint(k4, (), 0, w)
            y0 = jnp.minimum(y0, h - rh)
            x0 = jnp.minimum(x0, w - rw)
            mask = ((yy >= y0) & (yy < y0 + rh)
                    & (xx >= x0) & (xx < x0 + rw)).astype(data.dtype)
            area = jnp.sum(mask) + 1e-8
            fill = jnp.sum(mask[..., None] * data, axis=(0, 1)) / area
            on = do_blank & (slot < n_rect)
            sel = mask[..., None] * chan_on * on
            data = data * (1 - sel) + fill * sel

    if cfg.p_brightness_gradient > 0:
        # BrightnessGradientAdditiveTransform: += kernel · strength,
        # strength = ±U(1, 5) per channel (mean_centered=False)
        nch = data.shape[-1]
        kern = _local_gaussian_kernel(ks5[7], h, w)
        km, ksign, kon = jax.random.split(ks5[8], 3)
        mag = jax.random.uniform(km, (nch,), minval=1.0, maxval=5.0)
        sign = jnp.where(jax.random.bernoulli(ksign, 0.5, (nch,)), 1.0, -1.0)
        chan_on = jax.random.bernoulli(kon, 0.5, (nch,))
        add = kern[..., None] * mag * sign * chan_on
        data = jnp.where(u5[4] < cfg.p_brightness_gradient, data + add, data)

    if cfg.p_local_gamma > 0:
        # LocalGammaTransform: per-pixel exponent interpolates 1 → gamma by
        # the kernel; gamma ~ U(0.01, 0.8) | U(1.5, 4) (reference :365-366)
        nch = data.shape[-1]
        kern = _local_gaussian_kernel(ks5[9], h, w)
        kg1, kg2, kpick, kon = jax.random.split(ks5[10], 4)
        g_lo = jax.random.uniform(kg1, (nch,), minval=0.01, maxval=0.8)
        g_hi = jax.random.uniform(kg2, (nch,), minval=1.5, maxval=4.0)
        g = jnp.where(jax.random.bernoulli(kpick, 0.5, (nch,)), g_lo, g_hi)
        chan_on = jax.random.bernoulli(kon, 0.5, (nch,))
        mn = jnp.min(data, axis=(0, 1), keepdims=True)
        mx = jnp.max(data, axis=(0, 1), keepdims=True)
        xn = (data - mn) / (mx - mn + 1e-7)
        expnt = kern[..., None] * (g - 1.0) * chan_on + 1.0
        res = jnp.power(jnp.maximum(xn, 1e-7), expnt) * (mx - mn) + mn
        data = jnp.where(u5[5] < cfg.p_local_gamma, res, data)

    if cfg.p_sharpen > 0:
        # SharpeningTransform(strength=(0.1,1)): unsharp via the laplacian,
        # clipped to the original per-channel range
        s = jax.random.uniform(ks5[11], (), minval=cfg.sharpen_strength[0],
                               maxval=cfg.sharpen_strength[1])
        mn = jnp.min(data, axis=(0, 1), keepdims=True)
        mx = jnp.max(data, axis=(0, 1), keepdims=True)
        sharp = jnp.clip(data + s * _laplacian(data), mn, mx)
        data = jnp.where(u5[6] < cfg.p_sharpen, sharp, data)
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
                 data_order: int = 1, out_size=None):
        import numpy as np

        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.n_threads = n_threads
        # 0 = nearest data resampling (nnUNetTrainerDAOrd0's
        # order_resampling_data=0); 1 = bilinear (default)
        self.data_order = data_order
        # when set, inputs are INITIAL-size patches (get_initial_patch_size)
        # and every output is center-cropped to this final size — rotated
        # patch corners then contain real image content, like the
        # reference's enlarged-loader + SpatialTransform center crop
        self.out_size = tuple(out_size) if out_size is not None else None

    def _finish(self, data, seg):
        if self.out_size is None:
            return data, seg
        return center_crop_batch(data, seg, self.out_size)

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
            return self._finish(data, seg)
        angles = np.where(rot, self.rng.uniform(-cfg.rotation_max,
                                                cfg.rotation_max, B), 0.0)
        scales = np.where(sc, self.rng.uniform(cfg.scale_range[0],
                                               cfg.scale_range[1], B), 1.0)
        data = np.ascontiguousarray(data, np.float32)
        seg16 = np.ascontiguousarray(seg, np.int16)
        # out_size goes into the kernel: only the centered crop window is
        # interpolated (identical values to transform-then-crop)
        out = affine_augment_batch_native(data, seg16, angles, scales, apply,
                                          n_threads=self.n_threads,
                                          data_order=self.data_order,
                                          out_size=self.out_size)
        if out is None:
            out = affine_augment_batch_numpy(data, seg16, angles, scales, apply,
                                             data_order=self.data_order,
                                             out_size=self.out_size)
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
                 data_order: int = 1, out_size=None, dummy_2d: bool = False):
        import numpy as np

        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.n_threads = n_threads
        self.data_order = data_order
        self.out_size = tuple(out_size) if out_size is not None else None
        # dummy-2D DA (reference nnUNetTrainer.py:401-408 +
        # transforms_for_dummy_2d.py): anisotropic patches rotate/scale
        # IN-PLANE only (±180°, every z-slice of a sample gets the same
        # transform); the out-of-plane axis is never resampled
        self.dummy_2d = dummy_2d

    def _finish(self, data, seg):
        if self.out_size is None:
            return data, seg
        return center_crop_batch(data, seg, self.out_size)

    def __call__(self, data, seg):
        import numpy as np

        from ldiffusion_tpu.native import (
            affine_augment_batch_3d_native,
            affine_augment_batch_3d_numpy,
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
            return self._finish(data, seg)
        scales = np.where(sc, self.rng.uniform(cfg.scale_range[0],
                                               cfg.scale_range[1], B), 1.0)
        data = np.ascontiguousarray(data, np.float32)
        seg16 = np.ascontiguousarray(seg, np.int16)

        if self.dummy_2d:
            # (B, Z, H, W, C) → (B·Z, H, W, C): the Convert3DTo2D /
            # Convert2DTo3D trick, with per-SAMPLE draws repeated across z.
            # In-plane out_size goes into the 2D kernel (only the crop
            # window is interpolated); z is cropped after reshape (it is a
            # no-op for configure_spatial_da's plans, which never enlarge z).
            Bz, Z, H, W, C = data.shape
            out2d = None if self.out_size is None else self.out_size[1:]
            OH, OW = (H, W) if out2d is None else out2d
            angles = np.where(rot, self.rng.uniform(-np.pi, np.pi, B), 0.0)
            d2 = np.ascontiguousarray(data.reshape(B * Z, H, W, C))
            s2 = np.ascontiguousarray(seg16.reshape(B * Z, H, W))
            rep = lambda a: np.repeat(a, Z)
            out = affine_augment_batch_native(
                d2, s2, rep(angles), rep(scales), rep(apply),
                n_threads=self.n_threads, data_order=self.data_order,
                out_size=out2d)
            if out is None:
                out = affine_augment_batch_numpy(
                    d2, s2, rep(angles), rep(scales), rep(apply),
                    data_order=self.data_order, out_size=out2d)
            d, s = out
            d = d.reshape(B, Z, OH, OW, C)
            s = s.reshape(B, Z, OH, OW).astype(seg.dtype)
            if self.out_size is not None and Z != self.out_size[0]:
                d, s = center_crop_batch(d, s, self.out_size)
            return d, s

        rmax = cfg.rotation_max_3d
        ax = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        ay = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        az = np.where(rot, self.rng.uniform(-rmax, rmax, B), 0.0)
        out = affine_augment_batch_3d_native(
            data, seg16, ax, ay, az, scales, apply,
            n_threads=self.n_threads, data_order=self.data_order,
            out_size=self.out_size)
        if out is None:
            out = affine_augment_batch_3d_numpy(
                data, seg16, ax, ay, az, scales, apply,
                data_order=self.data_order, out_size=self.out_size)
        d, s = out
        return d, s.astype(seg.dtype)
