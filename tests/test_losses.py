import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldiffusion_tpu.losses import (
    CombinedLoss,
    contrastive_loss,
    dc_and_ce_loss,
    deep_supervision_loss,
    micro_dice,
    robust_cross_entropy,
    soft_dice_loss,
)
from ldiffusion_tpu.losses.dice import micro_dice_soft, topk_cross_entropy, focal_loss


def test_soft_dice_perfect_prediction():
    t = jnp.zeros((2, 8, 8), jnp.int32).at[:, :4].set(1)
    logits = jax.nn.one_hot(t, 3) * 20.0
    # absent-class smooth-term leakage keeps this slightly above 0 (same as
    # nnUNet's soft dice with smooth=1e-5)
    loss = soft_dice_loss(logits, t)
    assert float(loss) < 0.05


def test_soft_dice_worst_prediction():
    t = jnp.zeros((1, 8, 8), jnp.int32)
    logits = jnp.stack([jnp.full((1, 8, 8), -20.0), jnp.full((1, 8, 8), 20.0)], axis=-1)
    # predicts class1 everywhere, target class0 -> fg dice ~0 -> loss ~1
    assert float(soft_dice_loss(logits, t)) > 0.95


def test_robust_ce_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4)))
    got = float(robust_cross_entropy(logits, t))
    logp = jax.nn.log_softmax(logits, -1)
    want = float(-jnp.mean(jnp.take_along_axis(logp, t[..., None], -1)))
    assert abs(got - want) < 1e-5


def test_ce_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    t = jnp.full((1, 2, 2), 255)
    assert float(robust_cross_entropy(logits, t, ignore_index=255)) == 0.0


def test_micro_dice_empty_class_convention():
    """Empty classes (absent in both) score 1 (segmentor.py:127-128)."""
    pred = jnp.zeros((1, 4, 4), jnp.int32)
    true = jnp.zeros((1, 4, 4), jnp.int32)
    scores, mean = micro_dice(pred, true, 7)
    np.testing.assert_allclose(np.asarray(scores), np.ones(7))
    assert float(mean) == 1.0


def test_micro_dice_mixed():
    pred = jnp.zeros((1, 2, 2), jnp.int32).at[0, 0, 0].set(1)
    true = jnp.zeros((1, 2, 2), jnp.int32)
    scores, _ = micro_dice(pred, true, 2)
    # class0: tp=3 fp=0 fn=1 -> 6/7 ; class1: tp=0 fp=1 fn=0 -> 0
    np.testing.assert_allclose(np.asarray(scores), [6 / 7, 0.0], rtol=1e-5)


def test_combined_loss_differentiable():
    loss = CombinedLoss(num_classes=4)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 4, size=(1, 8, 8)))
    g = jax.grad(lambda l: loss(l, t))(logits)
    assert float(jnp.sum(jnp.abs(g))) > 0  # fixed: reference dice had no grad


def test_deep_supervision_weights():
    t = jnp.zeros((1, 8, 8), jnp.int32)
    l_full = jax.nn.one_hot(t, 2) * 10
    l_half = jax.nn.one_hot(t[:, ::2, ::2], 2) * 10
    l_quarter = jax.nn.one_hot(t[:, ::4, ::4], 2) * 10
    fn = lambda lg, tg: robust_cross_entropy(lg, tg)
    out = deep_supervision_loss([l_full, l_half, l_quarter],
                                [t, t[:, ::2, ::2], t[:, ::4, ::4]], fn)
    assert np.isfinite(float(out))


def test_contrastive_loss_separates():
    """Well-separated per-class features must score lower than mixed ones."""
    key = jax.random.key(0)
    h = w = 16
    labels = jnp.zeros((1, h, w), jnp.int32).at[:, : h // 2].set(1)
    f_good = jnp.where(labels[..., None] == 1, 10.0, -10.0) * jnp.ones((1, h, w, 4))
    f_bad = jax.random.normal(jax.random.key(1), (1, h, w, 4))
    lg = float(contrastive_loss(f_good, labels, key, num_negatives=32, num_anchors=16))
    lb = float(contrastive_loss(f_bad, labels, key, num_negatives=32, num_anchors=16))
    assert lg < lb


def test_contrastive_no_valid_anchor_is_zero():
    """Single-class image: no class has non-members -> loss 0 (loss.py:106)."""
    f = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    out = float(contrastive_loss(f, labels, jax.random.key(1), num_negatives=16, num_anchors=8))
    assert out == 0.0


def test_topk_and_focal_finite():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8)))
    assert np.isfinite(float(topk_cross_entropy(logits, t)))
    assert np.isfinite(float(focal_loss(logits, t)))


def test_dice_psum_under_shard_map():
    """Batch dice with axis_name must equal single-device dice on the full
    batch (the AllGatherGrad-equivalence property, dice.py:107-110)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 3, size=(8, 8, 8)))

    full = float(soft_dice_loss(logits, t, batch_dice=True))

    def shard_fn(lg, tg):
        return soft_dice_loss(lg, tg, batch_dice=True, axis_name="data")

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=(P("data"), P("data")),
                        out_specs=P())
    got = float(sharded(logits, t))
    assert abs(full - got) < 1e-4
