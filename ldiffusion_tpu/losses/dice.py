"""Dice / cross-entropy loss family.

Covers both loss stacks in the reference:

* nnUNet stack (``model/nnunetv2/training/loss/``): soft dice with
  batch-dice + cross-mesh ``psum`` of tp/fp/fn (replacing the differentiable
  ``AllGatherGrad`` collective, ``utilities/ddp_allgather.py:25-48`` — under
  pjit the gradient of ``psum`` is handled by XLA automatically), robust CE,
  DC+CE / DC+Focal compounds, TopK CE, deep-supervision weighting
  (``training/loss/deep_supervision.py:5-30``).
* L-Diffusion cell stack (``model/loss.py:128-186``): MicroDice with
  asymmetric FP/FN weights (0.3/0.7) and class weights — implemented here
  with *soft* probabilities so it is differentiable (the reference's argmax
  dice had zero gradient; documented fix, SURVEY §7 "bugs not to replicate").

Conventions: logits are channels-last (B, *spatial, C) — 2D or 3D; targets
are (B, *spatial) int; an optional ``loss_mask`` handles the ignore label
(-1 padding regions / 255).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _one_hot(targets, num_classes):
    return jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)


def soft_dice_loss(logits, targets, loss_mask=None, batch_dice: bool = True,
                   smooth: float = 1e-5, axis_name: Optional[str] = None,
                   include_background: bool = False):
    """Memory-efficient soft dice (reference ``training/loss/dice.py:58-119``).

    With ``axis_name`` set, tp/fp/fn are psum'd across that mesh axis first —
    the pjit-native analog of nnUNet's AllGatherGrad batch dice
    (``dice.py:107-110``).
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _one_hot(targets, c)
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        probs, onehot = probs * m, onehot * m
    # all axes except channels (and except batch when batch_dice=False) —
    # rank-agnostic so 3D (B, Z, H, W, C) volumes reduce correctly
    spatial = tuple(range(1, probs.ndim - 1))
    reduce_axes = (0,) + spatial if batch_dice else spatial
    tp = jnp.sum(probs * onehot, axis=reduce_axes)
    fp = jnp.sum(probs * (1.0 - onehot), axis=reduce_axes)
    fn = jnp.sum((1.0 - probs) * onehot, axis=reduce_axes)
    if axis_name is not None:
        tp = jax.lax.psum(tp, axis_name)
        fp = jax.lax.psum(fp, axis_name)
        fn = jax.lax.psum(fn, axis_name)
    if not include_background:
        tp, fp, fn = tp[..., 1:], fp[..., 1:], fn[..., 1:]
    dc = (2 * tp + smooth) / jnp.clip(2 * tp + fp + fn + smooth, 1e-8)
    return 1.0 - jnp.mean(dc)


def _gather_logp(logp, targets):
    """-log p[target] via a one-hot contraction. ``take_along_axis`` lowers
    to a serial gather on TPU (profiled at ~32 ms/step on the 2×1024²×7
    deep-supervision CE — BASELINE.md round 3); the iota-compare one-hot
    fuses into a vectorized multiply-reduce instead."""
    c = logp.shape[-1]
    onehot = jax.nn.one_hot(jnp.clip(targets, 0, c - 1), c, dtype=logp.dtype)
    return jnp.sum(logp * onehot, axis=-1)


def robust_cross_entropy(logits, targets, loss_mask=None, ignore_index: Optional[int] = None):
    """CE over NHWC logits (reference ``training/loss/robust_ce_loss.py:6-15``;
    ignore_index=255 path of ``model/loss.py:177``)."""
    valid = jnp.ones(targets.shape, jnp.float32)
    if ignore_index is not None:
        valid = valid * (targets != ignore_index)
    if loss_mask is not None:
        valid = valid * loss_mask.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_gather_logp(logp, targets)
    return jnp.sum(nll * valid) / jnp.clip(jnp.sum(valid), 1.0)


def topk_cross_entropy(logits, targets, k_percent: float = 10.0, ignore_index=None,
                       label_smoothing: float = 0.0, loss_mask=None):
    """TopK CE (reference ``robust_ce_loss.py:18-31``): mean over the hardest
    k% pixels. ``label_smoothing`` implements the Topk10LossLS01 variant
    (torch CrossEntropyLoss(label_smoothing=0.1) inside TopKLoss, reference
    ``variants/loss/nnUNetTrainerTopkLoss.py``). ``loss_mask``/``ignore_index``
    zero ignored pixels BEFORE the top-k selection — the torch reference gets
    this from CrossEntropyLoss(ignore_index); without it, high-loss ignore
    pixels would flood the hardest-k% set."""
    valid = jnp.ones(targets.shape, jnp.float32)
    if ignore_index is not None:
        valid = valid * (targets != ignore_index)
    if loss_mask is not None:
        valid = valid * loss_mask.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_gather_logp(logp, targets)
    if label_smoothing > 0.0:
        # torch semantics: (1-eps)*nll + eps*mean_c(-logp)
        nll = (1.0 - label_smoothing) * nll \
            - label_smoothing * jnp.mean(logp, axis=-1)
    nll = (nll * valid).reshape(-1)
    k = max(1, int(nll.size * k_percent / 100.0))
    topk, _ = jax.lax.top_k(nll, k)
    return jnp.mean(topk)


def focal_loss(logits, targets, alpha: float = 1.0, gamma: float = 2.0, loss_mask=None):
    """Focal loss (fork addition, reference ``compound_losses.py:152-181``;
    also ``model/loss.py:188-204``)."""
    valid = jnp.ones(targets.shape, jnp.float32)
    if loss_mask is not None:
        valid = valid * loss_mask.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -_gather_logp(logp, targets)
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce
    return jnp.sum(fl * valid) / jnp.clip(jnp.sum(valid), 1.0)


def dc_and_ce_loss(logits, targets, loss_mask=None, weight_dice: float = 1.0,
                   weight_ce: float = 1.0, axis_name=None, batch_dice=True):
    """nnUNet's default compound (reference ``compound_losses.py:8-57``)."""
    dc = soft_dice_loss(logits, targets, loss_mask, batch_dice=batch_dice, axis_name=axis_name)
    ce = robust_cross_entropy(logits, targets, loss_mask)
    return weight_dice * dc + weight_ce * ce


def dc_and_focal_loss(logits, targets, loss_mask=None, axis_name=None, batch_dice=True):
    """The fork's region-based loss swap (reference
    ``nnUNetTrainer.py:350-355``, ``compound_losses.py:183-207``)."""
    dc = soft_dice_loss(logits, targets, loss_mask, batch_dice=batch_dice, axis_name=axis_name)
    return dc + focal_loss(logits, targets)


def deep_supervision_loss(logits_list: Sequence, targets_list: Sequence, loss_fn, weights=None):
    """Exponentially-decayed multi-scale loss (reference
    ``deep_supervision.py:5-30``; weights built at ``nnUNetTrainer.py:364-373``:
    1/2^i, lowest scale zeroed, normalized)."""
    n = len(logits_list)
    if weights is None:
        w = jnp.array([1.0 / (2 ** i) for i in range(n)])
        if n > 1:
            w = w.at[-1].set(0.0)
        w = w / jnp.sum(w)
    else:
        w = jnp.asarray(weights)
    total = 0.0
    for i, (lg, tg) in enumerate(zip(logits_list, targets_list)):
        total = total + w[i] * loss_fn(lg, tg)
    return total


def micro_dice_soft(logits, targets, num_classes: int, class_weights=None,
                    fp_weight: float = 0.3, fn_weight: float = 0.7, smooth: float = 1e-5):
    """Differentiable version of the reference MicroDiceLoss
    (``model/loss.py:128-171``): same asymmetric FP/FN weighting and class
    weights, soft probabilities instead of argmax (which had no gradient)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _one_hot(targets, num_classes)
    tp = jnp.sum(probs * onehot, axis=(0, 1, 2))
    fp = jnp.sum(probs * (1 - onehot), axis=(0, 1, 2))
    fn = jnp.sum((1 - probs) * onehot, axis=(0, 1, 2))
    present = (jnp.sum(onehot, axis=(0, 1, 2)) + fp) > 0
    dice = 2 * tp / (2 * tp + fp_weight * fp + fn_weight * fn + smooth)
    dice = jnp.where(present, dice, 0.0)  # reference: absent classes score 0
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        cw = jnp.concatenate([cw, jnp.ones(num_classes - cw.shape[0])]) if cw.shape[0] < num_classes else cw[:num_classes]
        dice = dice * cw
    return 1.0 - jnp.mean(dice)


def micro_dice(pred_labels, true_labels, num_classes: int):
    """Evaluation micro-dice with the empty-class=1 convention (reference
    ``segmentor.py:114-142`` / ``utils.py:55-82``). pred_labels may be logits
    (B,H,W,C) or labels (B,H,W). Returns (per_class (C,), mean)."""
    if pred_labels.ndim == 4:
        pred_labels = jnp.argmax(pred_labels, axis=-1)
    p = pred_labels.reshape(-1)
    t = true_labels.reshape(-1)
    po = _one_hot(p, num_classes)
    to = _one_hot(t, num_classes)
    tp = jnp.sum(po * to, axis=0)
    fp = jnp.sum(po * (1 - to), axis=0)
    fn = jnp.sum((1 - po) * to, axis=0)
    both_empty = (tp + fp + fn) == 0
    dice = jnp.where(both_empty, 1.0, 2 * tp / jnp.clip(2 * tp + fp + fn, 1e-8))
    return dice, jnp.mean(dice)


class CombinedLoss:
    """Reference ``model/loss.py:173-186``: weighted dice + CE(ignore 255),
    with the reference's class weights [1, 2, 2, 1]."""

    def __init__(self, num_classes: int = 7, dice_weight: float = 1.0, ce_weight: float = 1.0):
        self.num_classes = num_classes
        self.dice_weight = dice_weight
        self.ce_weight = ce_weight
        self.class_weights = (1.0, 2.0, 2.0, 1.0)

    def __call__(self, logits, targets):
        dice = micro_dice_soft(logits, targets, self.num_classes, self.class_weights)
        ce = robust_cross_entropy(logits, targets, ignore_index=255)
        return self.dice_weight * dice + self.ce_weight * ce


def binary_cross_entropy_with_logits(logits, targets, loss_mask=None):
    """Elementwise BCE over region channels (reference
    ``compound_losses.py:59-100`` uses torch BCEWithLogits)."""
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        return jnp.sum(bce * m) / jnp.clip(jnp.sum(m) * logits.shape[-1], 1.0)
    return jnp.mean(bce)


def soft_dice_loss_sigmoid(logits, region_targets, loss_mask=None,
                           batch_dice: bool = True, smooth: float = 1e-5,
                           axis_name=None):
    """Region-based soft dice with sigmoid nonlinearity (the dice half of
    ``DC_and_BCE_loss``). region_targets: (B, H, W, R) binary maps."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    tgt = region_targets.astype(jnp.float32)
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        probs, tgt = probs * m, tgt * m
    spatial = tuple(range(1, probs.ndim - 1))
    reduce_axes = (0,) + spatial if batch_dice else spatial
    tp = jnp.sum(probs * tgt, axis=reduce_axes)
    fp = jnp.sum(probs * (1 - tgt), axis=reduce_axes)
    fn = jnp.sum((1 - probs) * tgt, axis=reduce_axes)
    if axis_name is not None:
        tp = jax.lax.psum(tp, axis_name)
        fp = jax.lax.psum(fp, axis_name)
        fn = jax.lax.psum(fn, axis_name)
    dc = (2 * tp + smooth) / jnp.clip(2 * tp + fp + fn + smooth, 1e-8)
    return 1.0 - jnp.mean(dc)


def dc_and_bce_loss(logits, region_targets, loss_mask=None, axis_name=None,
                    batch_dice: bool = True):
    """Region-based compound (reference ``compound_losses.py:59-100``; the
    fork swaps this for DC_and_Focal at ``nnUNetTrainer.py:350-355`` — both
    are provided)."""
    dc = soft_dice_loss_sigmoid(logits, region_targets, loss_mask,
                                batch_dice=batch_dice, axis_name=axis_name)
    bce = binary_cross_entropy_with_logits(logits, region_targets, loss_mask)
    return dc + bce


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0,
                       loss_mask=None):
    """Binary (sigmoid) focal loss (the fork's ``FocalLoss``, reference
    ``compound_losses.py:152-170``): alpha*(1-p_t)^gamma * BCE, mean-reduced
    (masked mean when a loss mask is given, ``:197-200``)."""
    lg = logits.astype(jnp.float32)
    tg = targets.astype(jnp.float32)
    bce = jnp.maximum(lg, 0) - lg * tg + jnp.log1p(jnp.exp(-jnp.abs(lg)))
    p = jax.nn.sigmoid(lg)
    p_t = tg * p + (1 - tg) * (1 - p)
    fl = alpha * (1 - p_t) ** gamma * bce
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        return jnp.sum(fl * m) / jnp.clip(jnp.sum(m), 1e-8)
    return jnp.mean(fl)


def dc_and_focal_sigmoid_loss(logits, region_targets, loss_mask=None,
                              axis_name=None, batch_dice: bool = True):
    """The fork's region-training loss (reference ``nnUNetTrainer.py:350-355``
    builds ``DC_and_Focal_loss`` with sigmoid dice do_bg=True when the label
    manager has regions; ``compound_losses.py:173-207``)."""
    dc = soft_dice_loss_sigmoid(logits, region_targets, loss_mask,
                                batch_dice=batch_dice, axis_name=axis_name)
    fl = sigmoid_focal_loss(logits, region_targets, loss_mask=loss_mask)
    return dc + fl


def kl_div_multichannel(pred_logits, target_logits):
    """KL(softmax(target) || softmax(pred)) with batchmean reduction
    (reference ``model/loss.py:206-214``, unused there but inventoried)."""
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=1)
    q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=1)
    logq = jax.nn.log_softmax(target_logits.astype(jnp.float32), axis=1)
    kl = jnp.sum(q * (logq - logp))
    return kl / pred_logits.shape[0]
