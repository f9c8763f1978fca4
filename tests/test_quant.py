"""int8 W8A8 quantized ops (ops/quant.py): op-level error bounds, drop-in
param compatibility of the quant-capable layers, and an end-to-end accuracy
bound for the one-step diffusion transform under int8 mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldiffusion_tpu.ops.quant import (
    int8_conv,
    int8_matmul,
    quant_mode,
    set_quant_mode,
)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_quant_mode("none")


def test_int8_conv_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = int8_conv(x, k, (1, 1), ((1, 1), (1, 1)), b, out_dtype=jnp.float32)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel  # 8-bit symmetric: ~1% relative error


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32) * 0.1)
    ref = x @ w
    got = int8_matmul(x, w, out_dtype=jnp.float32)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / \
        np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel


def test_qconv_qdense_match_flax_when_off():
    """With quantization off, QConv/QDense must be numerically identical to
    nn.Conv/nn.Dense (same param names too, so checkpoints interchange)."""
    import flax.linen as nn

    from ldiffusion_tpu.models.layers import QConv, QDense

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    qc = QConv(24, (3, 3), padding=1)
    fc = nn.Conv(24, (3, 3), padding=1)
    vq = qc.init(jax.random.key(0), x)
    vf = fc.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(vq) == jax.tree_util.tree_structure(vf)
    np.testing.assert_allclose(np.asarray(qc.apply(vf, x)),
                               np.asarray(fc.apply(vf, x)), atol=1e-6)

    xd = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    qd = QDense(24)
    fd = nn.Dense(24)
    vd = fd.init(jax.random.key(1), xd)
    np.testing.assert_allclose(np.asarray(qd.apply(vd, xd)),
                               np.asarray(fd.apply(vd, xd)), atol=1e-6)


def test_int8_mode_changes_forward_but_stays_close():
    from ldiffusion_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    block = ResnetBlock(32, groups=8)
    variables = block.init(jax.random.key(0), x, temb)
    ref = np.asarray(block.apply(variables, x, temb))
    set_quant_mode("int8_all")  # tiny channels: the "int8" gate would skip
    try:
        got = np.asarray(block.apply(variables, x, temb))
    finally:
        set_quant_mode("none")
    assert not np.allclose(got, ref)  # the path really switched
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


@pytest.mark.slow
def test_one_step_transform_int8_accuracy_bound():
    """End-to-end accuracy gate for the DEPLOYMENT mode ("int8", shape-gated):
    with an SD-v1.5-channel VAE (the layers the gate actually quantizes on
    the benchmark config), the transformed image ([0,1] RGB) stays within a
    small max-error of the f32 path."""
    from ldiffusion_tpu.diffusion.pipeline import (
        SDComponents,
        one_step_transform,
        trajectory_text_emb,
    )
    from ldiffusion_tpu.models.vae import VAEConfig

    comps = SDComponents.random(image_size=64, vae_config=VAEConfig.sd15())
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3)
    emb = trajectory_text_emb(comps, comps.params, 1)
    ref = np.asarray(one_step_transform(comps, comps.params, img, emb))
    set_quant_mode("int8")
    try:
        got = np.asarray(one_step_transform(comps, comps.params, img, emb))
    finally:
        set_quant_mode("none")
    assert not np.allclose(got, ref)  # the gate engaged (c512 VAE layers)
    err = np.abs(got - ref)
    # output lives in [0,1]. RANDOM weights are the worst case for int8
    # error propagation (no learned smoothness): measured 0.080 max / 0.012
    # mean with exact amax, +~0.015 max from the subsampled-amax estimate
    # (BASELINE.md round 3). Real-weight validation stays env-blocked
    # (standing VERDICT item) — these bounds pin the random-weight behavior.
    assert err.mean() < 0.02, err.mean()
    assert err.max() < 0.12, err.max()


@pytest.mark.slow
def test_one_step_transform_int8_all_stays_bounded():
    """Ablation mode ("int8_all"): every conv AND matmul quantized on tiny
    random weights — the worst case; error must stay bounded (looser)."""
    from ldiffusion_tpu.diffusion.pipeline import (
        SDComponents,
        one_step_transform,
        trajectory_text_emb,
    )

    comps = SDComponents.random(image_size=64)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3)
    emb = trajectory_text_emb(comps, comps.params, 1)
    ref = np.asarray(one_step_transform(comps, comps.params, img, emb))
    set_quant_mode("int8_all")
    try:
        got = np.asarray(one_step_transform(comps, comps.params, img, emb))
    finally:
        set_quant_mode("none")
    assert np.abs(got - ref).max() < 0.15


@pytest.mark.slow
def test_static_calibration_matches_dynamic():
    """int8_static (calibrated constant scales — the fuse-into-producer
    deployment path) must stay close to the dynamic gated mode, and the
    calibration must discover every gated site of the sd15-channel VAE."""
    from ldiffusion_tpu.diffusion.pipeline import (
        SDComponents,
        one_step_transform,
        trajectory_text_emb,
    )
    from ldiffusion_tpu.models.vae import VAEConfig
    from ldiffusion_tpu.ops.quant import (
        calibrate_static_scales,
        set_static_amax,
        static_amax,
    )

    comps = SDComponents.random(image_size=64, vae_config=VAEConfig.sd15())
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3)
    emb = trajectory_text_emb(comps, comps.params, 1)

    ref = np.asarray(one_step_transform(comps, comps.params, img, emb))

    scales = calibrate_static_scales(
        lambda im: one_step_transform(comps, comps.params, im, emb), img)
    assert len(scales) > 10, scales   # the c512 VAE layers all calibrated
    assert all(v > 0 and np.isfinite(v) for v in scales.values())
    # mode restored after calibration
    assert quant_mode() == "none"

    set_quant_mode("int8_static")
    set_static_amax(scales)
    try:
        assert len(static_amax()) == len(scales)
        stat = np.asarray(one_step_transform(comps, comps.params, img, emb))
    finally:
        set_static_amax(None)
        set_quant_mode("none")
    # static must meet the SAME random-weight accuracy budget as the dynamic
    # gated mode (test_one_step_transform_int8_accuracy_bound): the two modes
    # round with different per-tensor scales, so comparing them to each other
    # doubles the error — the f32 reference is the meaningful yardstick
    err = np.abs(stat - ref)
    assert not np.allclose(stat, ref)  # the static path engaged
    assert err.mean() < 0.02, err.mean()
    assert err.max() < 0.12, err.max()


def test_conv_shape_gate_matches_measurements():
    """The gate encodes the measured v5e win/loss table (BASELINE.md r3)."""
    from ldiffusion_tpu.ops.quant import conv_shape_gate

    wins = [(256, 256), (512, 256), (512, 512), (640, 640), (1280, 640),
            (1280, 1280)]
    losses = [(128, 128), (320, 320), (960, 320), (3, 128)]
    assert all(conv_shape_gate(*s) for s in wins)
    assert not any(conv_shape_gate(*s) for s in losses)
