"""DA5 transform stack (reference nnUNetTrainerDA5.py:106-264): each
distinctive transform engages, keeps data/seg consistent, and the
nnUNetTrainerDA5 variant composes them with the reference probabilities.
"""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ldiffusion_tpu.data.augment import AugmentConfig, augment_batch  # noqa: E402

_OFF = dict(p_rotation=0, p_scaling=0, p_noise=0, p_blur=0, p_brightness=0,
            p_contrast=0, p_lowres=0, p_gamma_invert=0, p_gamma=0, p_mirror=0)


def _base(**kw):
    return AugmentConfig(**{**_OFF, **kw})


def _img(h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.normal(size=(4, h, w, c)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, size=(4, h, w)), jnp.int32)
    return data, seg


def _runs(cfg, n=16, seed=1):
    data, seg = _img()
    outs = []
    for i in range(n):
        d, s = augment_batch(jax.random.key(seed + i), data, seg, cfg)
        outs.append((np.asarray(d), np.asarray(s), np.asarray(data),
                     np.asarray(seg)))
    return outs


def test_rot90_engages_and_rotates_seg_with_data():
    cfg = _base(p_rot90=1.0)
    data, seg = _img()
    # seg-as-data probe: encode seg into a data channel, rotation must move
    # both identically
    probe = jnp.concatenate([data[..., :2], seg[..., None].astype(jnp.float32)],
                            axis=-1)
    changed = 0
    for i in range(8):
        d, s = augment_batch(jax.random.key(i), probe, seg, cfg)
        np.testing.assert_array_equal(np.asarray(d[..., 2], np.int32),
                                      np.asarray(s))
        if not np.array_equal(np.asarray(s), np.asarray(seg)):
            changed += 1
    assert changed > 0, "rot90 never engaged over 8 batches of 4"


def test_transpose_engages():
    cfg = _base(p_transpose=1.0)
    data, seg = _img()
    d, s = augment_batch(jax.random.key(0), data, seg, cfg)
    np.testing.assert_array_equal(np.asarray(d),
                                  np.asarray(jnp.swapaxes(data, 1, 2)))
    np.testing.assert_array_equal(np.asarray(s),
                                  np.asarray(jnp.swapaxes(seg, 1, 2)))


def test_rot90_transpose_skipped_for_nonsquare():
    cfg = _base(p_rot90=1.0, p_transpose=1.0)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(2, 8, 16, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, size=(2, 8, 16)), jnp.int32)
    d, s = augment_batch(jax.random.key(0), data, seg, cfg)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(data))


def test_median_filter_removes_salt_and_pepper():
    from ldiffusion_tpu.data.augment import _median_filter

    rng = np.random.default_rng(0)
    img = np.full((16, 16, 1), 0.5, np.float32)
    img[8, 8, 0] = 100.0  # single impulse
    out = np.asarray(_median_filter(jnp.asarray(img), 3))
    assert out[8, 8, 0] == pytest.approx(0.5)

    # through the stack: engages for some keys (OneOf coin × p), and when it
    # does the impulse is gone
    cfg = _base(p_median=1.0)
    data = jnp.asarray(np.broadcast_to(img, (4, 16, 16, 1)).copy())
    seg = jnp.zeros((4, 16, 16), jnp.int32)
    engaged = 0
    for i in range(16):
        d, _ = augment_batch(jax.random.key(i), data, seg, cfg)
        d = np.asarray(d)
        for b in range(4):
            if d[b, 8, 8, 0] != pytest.approx(100.0):
                engaged += 1
                assert d[b, 8, 8, 0] == pytest.approx(0.5)
    assert engaged > 0, "median never engaged (OneOf coin p=0.5 × p=1)"


def test_blank_rectangle_fills_with_region_mean():
    cfg = _base(p_blank_rect=1.0)
    any_blanked = False
    for d, s, d0, s0 in _runs(cfg, n=8):
        np.testing.assert_array_equal(s, s0)  # seg untouched
        diff = (d != d0).any(-1)
        if diff.any():
            any_blanked = True
            # changed pixels must form ≤5 rectangles of bounded size: just
            # check the fill is locally constant per changed channel region
            b = np.argwhere(diff.any((1, 2)))[0][0]
            ch = np.argwhere((d[b] != d0[b]).any((0, 1)))[0][0]
            changed_vals = d[b][..., ch][diff[b] & (d[b][..., ch] != d0[b][..., ch])]
            if changed_vals.size:
                assert len(np.unique(np.round(changed_vals, 5))) <= 5
    assert any_blanked


def test_brightness_gradient_additive():
    cfg = _base(p_brightness_gradient=1.0)
    data, seg = _img()
    peak = 0.0
    for i in range(8):
        d, s = augment_batch(jax.random.key(3 + i), data, seg, cfg)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(seg))
        add = np.asarray(d) - np.asarray(data)
        assert np.isfinite(add).all()
        peak = max(peak, float(np.abs(add).max()))
    # strength is ±U(1,5) at the kernel peak; over 8×4 samples with
    # per-channel engage 0.5 SOME channel must have moved appreciably
    assert peak > 0.1


def test_local_gamma_changes_but_preserves_range():
    cfg = _base(p_local_gamma=1.0)
    data, seg = _img()
    d = np.asarray(augment_batch(jax.random.key(5), data, seg, cfg)[0])
    d0 = np.asarray(data)
    assert (d != d0).any()
    for b in range(d.shape[0]):
        for c in range(d.shape[-1]):
            assert d[b, ..., c].min() >= d0[b, ..., c].min() - 1e-4
            assert d[b, ..., c].max() <= d0[b, ..., c].max() + 1e-4


def test_sharpening_engages_and_clips():
    cfg = _base(p_sharpen=1.0)
    data, seg = _img()
    d = np.asarray(augment_batch(jax.random.key(7), data, seg, cfg)[0])
    d0 = np.asarray(data)
    assert (d != d0).any()
    for b in range(d.shape[0]):
        for c in range(d.shape[-1]):
            assert d[b, ..., c].min() >= d0[b, ..., c].min() - 1e-5
            assert d[b, ..., c].max() <= d0[b, ..., c].max() + 1e-5


def test_da5_brightness_is_additive_and_contrast_clips():
    # additive: with sigma 0.5 some channels shift by a constant
    cfg = _base(p_brightness=1.0, brightness_additive_sigma=0.5)
    data, seg = _img()
    d = np.asarray(augment_batch(jax.random.key(11), data, seg, cfg)[0])
    shift = d - np.asarray(data)
    # each (sample, channel) shift is spatially constant
    assert np.allclose(shift.std(axis=(1, 2)), 0, atol=1e-6)
    assert np.abs(shift).max() > 0

    # second gamma inverted when gamma2_invert set: output still finite/sane
    cfg = _base(p_gamma=1.0, gamma2_invert=True)
    d = np.asarray(augment_batch(jax.random.key(12), data, seg, cfg)[0])
    assert np.isfinite(d).all()
    assert (d != np.asarray(data)).any()


def test_da5_variant_composes_reference_probabilities():
    from ldiffusion_tpu.segmentor.variants import get_variant

    a = get_variant("nnUNetTrainerDA5").augment
    assert (a.p_rot90, a.p_transpose) == (0.5, 0.5)
    assert a.p_median == pytest.approx(0.2)
    assert a.blur_sigma == (0.3, 1.5)
    assert a.brightness_additive_sigma == pytest.approx(0.5)
    assert a.p_brightness == pytest.approx(0.1)
    assert a.contrast_range == (0.5, 2.0) and a.contrast_clip_half
    assert a.lowres_zoom == (0.25, 1.0) and a.p_lowres == pytest.approx(0.15)
    assert a.p_gamma_invert == pytest.approx(0.1)
    assert a.p_gamma == pytest.approx(0.1) and a.gamma2_invert
    assert a.p_blank_rect == pytest.approx(0.4)
    assert a.p_brightness_gradient == pytest.approx(0.3)
    assert a.p_local_gamma == pytest.approx(0.3)
    assert a.p_sharpen == pytest.approx(0.2)
    assert (a.p_rotation, a.p_scaling) == (0.4, 0.2)
    assert a.scale_range == (0.7, 1.43)

    # full stack runs end-to-end and stays finite with seg label set preserved
    data, seg = _img()
    d, s = augment_batch(jax.random.key(42), data, seg, a)
    assert np.isfinite(np.asarray(d)).all()
    assert set(np.unique(np.asarray(s))) <= set(np.unique(np.asarray(seg))) | {0}
