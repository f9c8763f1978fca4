"""Pins for the round-4 self-review fixes: median-filter borders, the
inference mirror-config helper, and Adan's optax schedule convention."""
import jax.numpy as jnp
import numpy as np

from ldiffusion_tpu.segmentor.variants import (
    get_variant,
    inference_mirror_config,
)


def test_median_filter_does_not_wrap_borders():
    """A bright bottom edge must not leak into the top rows via jnp.roll
    wrap-around (scipy's MedianFilterTransform uses non-wrapping borders)."""
    from ldiffusion_tpu.data.augment import _median_filter

    img = np.zeros((16, 16, 1), np.float32)
    img[-1, :, :] = 100.0  # bright opposite edge
    out = np.asarray(_median_filter(jnp.asarray(img), 7))
    # with wrap-around, rows 0-2 would see the 100s from the bottom edge;
    # the 7x7 median of {0.0 x majority} stays 0 everywhere above the edge
    assert np.all(out[:10] == 0.0)
    # interior median of a constant region is that constant
    img2 = np.full((16, 16, 1), 3.0, np.float32)
    assert np.allclose(np.asarray(_median_filter(jnp.asarray(img2), 3)), 3.0)


def test_inference_mirror_config_matrix():
    """(use_mirroring, axes) per variant — reference
    inference_allowed_mirroring_axes (nnUNetTrainer.py:1161-1167,
    nnUNetTrainerNoDA.py:37-38)."""
    assert inference_mirror_config(None, 2) == (True, None)
    for name in ("nnUNetTrainerNoMirroring", "nnUNetTrainerNoDA"):
        assert inference_mirror_config(get_variant(name), 2) == (False, None)
        assert inference_mirror_config(get_variant(name), 3) == (False, None)
    v01 = get_variant("nnUNetTrainer_onlyMirror01")
    assert inference_mirror_config(v01, 2) == (True, (0,))
    assert inference_mirror_config(v01, 3) == (True, (0, 1))
    base = get_variant("nnUNetTrainer")
    assert inference_mirror_config(base, 2) == (True, (0, 1))
    assert inference_mirror_config(base, 3) == (True, (0, 1, 2))


def test_adan_schedule_uses_preincrement_count():
    """First step must evaluate the schedule at 0 (optax convention:
    scale_by_schedule/adamw evaluate at the PRE-increment count)."""
    from ldiffusion_tpu.core.optim import adan

    tx = adan(lambda count: jnp.asarray(count, jnp.float32))  # lr == step
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.full(3, 2.0)}
    upd, state = tx.update(grads, state, params)
    # schedule(0) == 0 -> zero first update
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0)
    upd, state = tx.update(grads, state, params)
    # second step: schedule(1) == 1 -> nonzero update
    assert np.all(np.abs(np.asarray(upd["w"])) > 0)
