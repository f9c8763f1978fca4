"""Regression tests for round-3 advisor findings (ADVICE.md r3):
sklearn-KFold split parity, llround-matching numpy fallbacks, default
5-fold predict ensembling, ignore-masked postprocessing determination,
and mirror-TTA restriction at final validation.
"""
import numpy as np
import pytest


def test_splits_match_sklearn_kfold():
    """splits_final.json must be interchangeable with the reference's
    sklearn KFold(n_splits=5, shuffle=True, random_state=12345)
    (nnUNetTrainer.py:538-547)."""
    sklearn = pytest.importorskip("sklearn.model_selection")
    from ldiffusion_tpu.segmentor.splits import generate_crossval_splits

    for n in (7, 17, 50):
        keys = [f"case_{i:03d}" for i in range(n)]
        keys_sorted = np.sort(np.asarray(keys))
        ours = generate_crossval_splits(keys)
        kf = sklearn.KFold(n_splits=5, shuffle=True, random_state=12345)
        for fold, (tr_idx, va_idx) in enumerate(kf.split(keys_sorted)):
            assert ours[fold]["train"] == [str(k) for k in keys_sorted[tr_idx]]
            assert ours[fold]["val"] == [str(k) for k in keys_sorted[va_idx]]


def test_numpy_fallback_rounds_half_away_from_zero():
    """The numpy affine fallback must agree with fast_patches.cpp's
    std::llround on exact .5 source coordinates (scale 0.5 on an even
    patch puts EVERY coordinate on a tie)."""
    from ldiffusion_tpu.native import affine_augment_batch_numpy

    H = W = 4
    data = np.arange(H * W, dtype=np.float32).reshape(1, H, W, 1)
    seg = np.arange(H * W, dtype=np.int16).reshape(1, H, W)
    out_d, out_s = affine_augment_batch_numpy(
        data, seg, angles=np.zeros(1), scales=np.full(1, 0.5),
        apply=np.ones(1, np.uint8), data_order=0)
    # angle 0, scale 0.5: src = 2*i - 1.5 -> (-1.5, 0.5, 2.5, 4.5);
    # llround -> (-2, 1, 3, 5): rows/cols 0 and 3 fall outside -> 0 fill,
    # rows/cols 1, 2 sample src rows/cols 1, 3.
    expect_s = np.zeros((H, W), np.int16)
    expect_s[1:3, 1:3] = seg[0][np.ix_((1, 3), (1, 3))]
    np.testing.assert_array_equal(out_s[0], expect_s)
    np.testing.assert_array_equal(out_d[0, :, :, 0], expect_s.astype(np.float32))


def test_numpy_fallback_matches_native_on_ties():
    """Same tie configuration through the native C++ library (skipped when
    the toolchain can't build it)."""
    native = pytest.importorskip("ldiffusion_tpu.native")
    try:
        lib = native.load_library()
    except Exception:
        pytest.skip("native library unavailable")
    H = W = 8
    rng = np.random.default_rng(3)
    data = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    seg = rng.integers(0, 5, size=(2, H, W)).astype(np.int16)
    kw = dict(angles=np.zeros(2), scales=np.array([0.5, 2.0]),
              apply=np.ones(2, np.uint8), data_order=0)
    d_np, s_np = native.affine_augment_batch_numpy(data, seg, **kw)
    d_nat, s_nat = native.affine_augment_batch_native(data, seg, **kw)
    np.testing.assert_array_equal(s_np, s_nat)
    np.testing.assert_allclose(d_np, d_nat, atol=1e-6)


def test_determine_postprocessing_masks_ignore_label():
    """GT ignore pixels must not bias the keep-largest decision
    (reference determines postprocessing on ignore-masked metrics)."""
    from ldiffusion_tpu.segmentor.postprocess import determine_postprocessing

    from ldiffusion_tpu.segmentor.postprocess import _mean_fg_dice

    # GT: one true class-1 blob; the prediction is PERFECT on scored pixels
    # but carries a second class-1 component entirely inside the ignore
    # region. Unmasked, removing that component reduces "FP" and the no-op
    # step is accepted; ignore-masked it is a scoring tie and must be
    # rejected (the reference decides on ignore-masked metrics).
    gt = np.zeros((16, 16), np.int64)
    gt[2:8, 2:8] = 1                 # true blob (36 px, the largest comp)
    gt[10:13, 10:13] = 2             # ignore region (label value 2)
    pred = np.zeros_like(gt)
    pred[2:8, 2:8] = 1
    pred[10:13, 10:13] = 1           # component fully inside ignore
    unmasked = determine_postprocessing([pred], [gt], num_classes=3)
    assert unmasked, "sanity: unmasked scoring accepts the no-op step"
    masked = determine_postprocessing([pred], [gt], num_classes=3,
                                      ignore_label=2)
    assert masked == [], masked

    # the mechanism directly: perfect-on-scored-pixels -> dice 1.0 masked
    assert _mean_fg_dice([pred], [gt], 3, ignore_label=2) == pytest.approx(1.0)
    assert _mean_fg_dice([pred], [gt], 3) < 1.0


def _tiny_plan(num_classes=2):
    from ldiffusion_tpu.segmentor.planner import SegPlan

    return SegPlan(patch_size=(16, 16), batch_size=2,
                   features_per_stage=(4, 8), strides=(1, 2),
                   n_conv_per_stage=1, num_classes=num_classes, in_channels=3,
                   normalization="zscore_image", intensity_properties={},
                   median_shape=(24, 24), batch_dice=True,
                   deep_supervision=True)


def test_predictor_mirror_axes_restriction():
    """mirror_axes=(0,) must average exactly {identity, flip-axis-0} — the
    onlyMirror01 2D contract (reference inference_allowed_mirroring_axes)."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.models.dynunet import DynUNet
    from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

    plan = _tiny_plan()
    net = DynUNet(plan.network_config(), dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x, train=False)["params"]

    def fwd(t):
        return net.apply({"params": params}, t, train=False)

    p_restricted = SlidingWindowPredictor(plan, params, dtype=jnp.float32,
                                          mirror_axes=(0,))
    assert p_restricted.mirror_array_axes == (1,)
    got = p_restricted._tile_fn(params, x)
    want = (fwd(x) + jnp.flip(fwd(jnp.flip(x, 1)), 1)) / 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)

    p_off = SlidingWindowPredictor(plan, params, dtype=jnp.float32,
                                   use_mirroring=False)
    np.testing.assert_allclose(np.asarray(p_off._tile_fn(params, x)),
                               np.asarray(fwd(x)), atol=1e-6)

    p_full = SlidingWindowPredictor(plan, params, dtype=jnp.float32)
    assert p_full.mirror_array_axes == (1, 2)


def test_validation_threads_variant_mirror_config(tmp_path, monkeypatch):
    """NoMirroring-trained models must be validated WITHOUT mirror TTA;
    onlyMirror01 restricts the axes (reference nnUNetTrainer.py:1161-1167)."""
    import jax

    from ldiffusion_tpu.core.config import MeshConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.segmentor import trainer as trainer_mod
    from ldiffusion_tpu.segmentor import predictor as predictor_mod
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer
    from ldiffusion_tpu.segmentor.variants import get_variant

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    captured = {}
    real = predictor_mod.SlidingWindowPredictor

    class Spy(real):
        def __init__(self, *a, **kw):
            captured.update(use_mirroring=kw.get("use_mirroring", True),
                            mirror_axes=kw.get("mirror_axes"))
            super().__init__(*a, **kw)

    monkeypatch.setattr(predictor_mod, "SlidingWindowPredictor", Spy)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(16, 16, 3)).astype(np.float32)
    lab = rng.integers(0, 2, size=(16, 16))

    for name, want_mirror, want_axes in (
            ("nnUNetTrainerNoMirroring", False, None),
            ("nnUNetTrainerNoDA", False, None),
            ("nnUNetTrainer_onlyMirror01", True, (0,)),
            ("nnUNetTrainer", True, (0, 1))):
        variant = get_variant(name)
        tr = SegmentorTrainer(_tiny_plan(), None, mesh,
                              output_dir=str(tmp_path / name),
                              variant=variant)
        tr.perform_actual_validation([img], [lab], determine_pp=False)
        assert captured["use_mirroring"] == want_mirror, name
        assert captured["mirror_axes"] == want_axes, name
