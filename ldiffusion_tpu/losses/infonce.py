"""InfoNCE contrastive loss + VGG19 content loss (stage-1 objective).

Behavioral contract: reference ``model/loss.py:10-126``. The reference loops
in Python over unique labels / sampled anchors (data-dependent control flow —
unjittable); here the same statistical objective is a fixed-size masked
computation:

* A fixed pool of ``num_anchors`` anchor pixels is sampled uniformly; an
  anchor is *valid* iff its class has >1 member pixels and more than
  ``num_negatives`` non-member pixels (the reference's eligibility rule,
  ``loss.py:77``).
* Each anchor gets 1 positive (uniform over same-class pixels, self excluded)
  and ``num_negatives`` negatives (uniform over other-class pixels) via
  Gumbel-max sampling — with replacement, a documented deviation from the
  reference's ``randperm`` (statistically equivalent for 1024 of ≥3k pixels).
* Logits are raw dot products / temperature with CE against the positive
  (reference ``loss.py:98-103``).

The loss is a mean over valid anchors, ``0.0`` when none are valid
(reference ``loss.py:106-107``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ldiffusion_tpu.models.vgg import VGG19Features
from ldiffusion_tpu.ops.resize import resize_bilinear


def _gumbel(key, shape):
    return -jnp.log(-jnp.log(jax.random.uniform(key, shape, jnp.float32, 1e-20, 1.0) + 1e-20))


def contrastive_loss(features, labels, key, temperature: float = 0.5,
                     num_negatives: int = 1024, num_anchors: int = 64,
                     num_classes: Optional[int] = None):
    """features: (B, H, W, C) trajectory features; labels: (B, H, W) int.

    When ``num_classes`` is given, the first ``num_classes`` anchor slots are
    pinned one-per-present-class (the reference samples ``max(1, 1% of class
    pixels)`` anchors per class, ``loss.py:65-77`` — the floor guarantees rare
    classes always contribute gradient); remaining slots are uniform over
    pixels, matching the reference's ~area-proportional counts. Without it,
    all anchors are uniform (area-proportional in expectation, rare classes
    may get none).

    Returns scalar loss (mean CE over valid anchors across the batch).
    """
    b, h, w, c = features.shape
    n = h * w
    feats = features.reshape(b, n, c).astype(jnp.float32)
    labs = labels.reshape(b, n)
    if num_classes is not None and num_classes >= num_anchors:
        raise ValueError(f"num_anchors={num_anchors} must exceed num_classes={num_classes}")

    def per_image(feat, lab, k):
        k_anchor, k_pos, k_neg, k_cls = jax.random.split(k, 4)
        if num_classes is None:
            anchor_idx = jax.random.randint(k_anchor, (num_anchors,), 0, n)
            present = jnp.ones((num_anchors,), bool)
        else:
            class_mask = lab[None, :] == jnp.arange(num_classes)[:, None]  # (C,N)
            cls_scores = jnp.where(class_mask, _gumbel(k_cls, (num_classes, n)), -jnp.inf)
            cls_idx = jnp.argmax(cls_scores, axis=1)                       # (C,)
            uni_idx = jax.random.randint(k_anchor, (num_anchors - num_classes,), 0, n)
            anchor_idx = jnp.concatenate([cls_idx, uni_idx])
            present = jnp.concatenate([
                class_mask.any(axis=1),
                jnp.ones((num_anchors - num_classes,), bool),
            ])
        anchor_lab = lab[anchor_idx]                      # (A,)
        same = lab[None, :] == anchor_lab[:, None]        # (A, N)
        n_same = jnp.sum(same, axis=1)                    # (A,)
        n_diff = n - n_same
        valid = present & (n_same > 1) & (n_diff > num_negatives)  # loss.py:77

        # positive: same class, exclude self
        pos_mask = same.at[jnp.arange(num_anchors), anchor_idx].set(False)
        pos_scores = jnp.where(pos_mask, _gumbel(k_pos, (num_anchors, n)), -jnp.inf)
        pos_idx = jnp.argmax(pos_scores, axis=1)          # (A,)

        # negatives: different class, K with replacement via Gumbel per draw
        neg_logits = jnp.where(~same, 0.0, -jnp.inf)      # (A, N) uniform over diff
        neg_idx = jax.random.categorical(
            k_neg, neg_logits[:, None, :], axis=-1, shape=(num_anchors, num_negatives)
        )                                                  # (A, K)

        a_feat = feat[anchor_idx]                          # (A, C)
        p_feat = feat[pos_idx]                             # (A, C)
        n_feat = feat[neg_idx]                             # (A, K, C)

        pos_sim = jnp.sum(a_feat * p_feat, axis=-1) / temperature          # (A,)
        neg_sim = jnp.einsum("ac,akc->ak", a_feat, n_feat) / temperature   # (A, K)
        # CE with target 0 over [pos | negs]
        logits = jnp.concatenate([pos_sim[:, None], neg_sim], axis=1)
        ce = jax.nn.logsumexp(logits, axis=1) - pos_sim                    # (A,)
        n_valid = jnp.sum(valid)
        return jnp.where(n_valid > 0, jnp.sum(jnp.where(valid, ce, 0.0)) /
                         jnp.maximum(n_valid, 1), 0.0)

    keys = jax.random.split(key, b)
    losses = jax.vmap(per_image)(feats, labs, keys)
    return jnp.mean(losses)


@dataclasses.dataclass
class InfoNceLoss:
    """Combined content + contrastive loss (reference ``model/loss.py:111-126``)."""

    vgg: VGG19Features
    vgg_params: dict
    temperature: float = 0.5
    num_negatives: int = 1024
    num_anchors: int = 64
    num_classes: Optional[int] = None
    pretrained_vgg: bool = False

    @classmethod
    def create(cls, rng=None, vgg_weights_path: Optional[str] = None, **kw) -> "InfoNceLoss":
        """``vgg_weights_path`` may be an explicit path, or unset to use the
        ``LDIFFUSION_VGG19_WEIGHTS`` env var. Without weights the content loss
        runs on a random frozen VGG — a deterministic multiscale feature MSE,
        but NOT the reference's pretrained-VGG19 semantics (``model/loss.py:
        19-27``); a loud warning is emitted so this never happens silently."""
        import os
        import warnings

        vgg = VGG19Features()
        vgg_weights_path = vgg_weights_path or os.environ.get("LDIFFUSION_VGG19_WEIGHTS")
        if vgg_weights_path:
            from ldiffusion_tpu.models.safetensors_io import load_state_dict
            from ldiffusion_tpu.models.vgg import convert_vgg19

            params = convert_vgg19(load_state_dict(vgg_weights_path))
            pretrained = True
        else:
            warnings.warn(
                "InfoNceLoss: no VGG19 weights provided — content loss uses a "
                "RANDOM frozen VGG, deviating from the reference's pretrained "
                "VGG19 (model/loss.py:19-27). Pass vgg_weights_path= or set "
                "LDIFFUSION_VGG19_WEIGHTS to a torchvision vgg19 state dict.",
                stacklevel=2,
            )
            rng = jax.random.key(7) if rng is None else rng
            params = vgg.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
            pretrained = False
        return cls(vgg=vgg, vgg_params=params, pretrained_vgg=pretrained, **kw)

    def content_loss(self, original, generated):
        """VGG feature MSE at 224x224 (reference ``loss.py:19-42``).
        original/generated: (B, H, W, 3)."""
        o = resize_bilinear(original.astype(jnp.float32), (224, 224))
        g = resize_bilinear(generated.astype(jnp.float32), (224, 224))
        fo = self.vgg.apply({"params": self.vgg_params}, o)
        fg = self.vgg.apply({"params": self.vgg_params}, g)
        return jnp.mean((fo - fg) ** 2)

    def __call__(self, original_image, generated_image, features, labels, key):
        content = self.content_loss(original_image, generated_image)
        contrast = contrastive_loss(features, labels, key, self.temperature,
                                    self.num_negatives, self.num_anchors,
                                    self.num_classes)
        return content + contrast
