"""nnUNet-style segmentor trainer, TPU-native.

Behavioral contract: the reference's ``nnUNetTrainer`` (reference
``training/nnUNetTrainer/nnUNetTrainer.py:66-1269``): SGD-nesterov lr 1e-2
wd 3e-5 momentum 0.99, PolyLR ``(1-e/E)^0.9`` stepped per epoch, 250 train /
50 val iterations per epoch, deep-supervision DC+CE with exponentially
decaying weights, grad-clip 12, EMA(0.9) pseudo-dice best-checkpointing,
``checkpoint_latest`` every 50 epochs + ``checkpoint_best`` + final, full
resume (network/optimizer/logger/epoch).

TPU-native design: AMP-fp16+GradScaler becomes bf16 compute (no scaler
needed); DDP gradient buckets become pjit data-parallel sharding (gradients
reduce over ICI automatically); the DA worker-process pool becomes the
on-device jitted augmentation stack; AllGatherGrad'd batch dice is the
global-batch dice under pjit semantics; ``all_gather_object`` of val
tp/fp/fn is a device reduction returned replicated.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldiffusion_tpu.core.checkpoint import load_pytree, save_pytree
from ldiffusion_tpu.core.config import SegmentorTrainConfig
from ldiffusion_tpu.core.dist import DATA_AXIS, FSDP_AXIS, MeshContext
from ldiffusion_tpu.core.logging import EpochLogger, TextLogger, dump_debug_json, is_main_process
from ldiffusion_tpu.data.augment import AugmentConfig, augment_batch, augment_batch_3d
from ldiffusion_tpu.data.patches import PatchSampler
from ldiffusion_tpu.losses.dice import (
    dc_and_focal_sigmoid_loss,
    deep_supervision_loss,
    robust_cross_entropy,
    soft_dice_loss,
)
from ldiffusion_tpu.models.dynunet import DynUNet
from ldiffusion_tpu.segmentor.planner import SegPlan
from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset


class SegTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array
    # BatchNorm running statistics (nnUNetTrainerBN variant) — empty dict for
    # instance-norm nets. Under pjit data parallelism the batch-stat
    # reductions are global (XLA inserts the collectives), which matches the
    # reference's SyncBatchNorm DDP wrap (nnUNetTrainer.py:218-220).
    batch_stats: dict = {}


def _validation_barrier(name: str) -> None:
    """Cross-host barrier for final validation (reference
    ``nnUNetTrainer.py:1226-1243`` ``dist.barrier()``). Module-level so tests
    can fake multi-host by monkeypatching; only reached when
    ``jax.process_count() > 1``."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def poly_lr(initial_lr: float, epoch: int, max_epochs: int, exponent: float = 0.9) -> float:
    """Reference ``training/lr_scheduler/polylr.py:4-21``."""
    return initial_lr * (1 - epoch / max_epochs) ** exponent


class SegmentorTrainer:
    def __init__(self, plan: SegPlan, config: SegmentorTrainConfig, mesh: MeshContext,
                 output_dir: str = "train_save/segmentor", augment: Optional[AugmentConfig] = None,
                 variant=None, label_manager=None):
        # variant: a segmentor.variants.TrainerVariant — the config-space
        # analog of nnUNet's trainer subclasses; overrides loss/lr/optimizer.
        # label_manager: segmentor.label_manager.LabelManager — regions regime
        # trains sigmoid heads with the fork's DC+Focal (reference
        # nnUNetTrainer.py:350-355); an ignore label masks losses/metrics.
        self.variant = variant
        self.label_manager = label_manager
        if label_manager is not None and label_manager.has_regions:
            assert plan.num_classes == label_manager.num_segmentation_heads, (
                plan.num_classes, label_manager.num_segmentation_heads)
        if variant is not None:
            config = variant.config
            augment = augment or variant.augment
            # dimension-dependent mirror restriction (onlyMirror01: (0,) in 2D)
            if variant.mirror_axes_2d is not None and len(plan.patch_size) == 2 \
                    and augment is not None:
                import dataclasses as _dc0

                augment = _dc0.replace(augment,
                                       mirror_axes=variant.mirror_axes_2d)
        self.plan = plan
        self.cfg = config
        self.mesh = mesh
        self.output_dir = output_dir
        self.augment_cfg = augment or AugmentConfig()
        # rotation/scale move to the host prefetch thread (native C++
        # resample — the device gather cost more than the UNet fwd; the
        # reference also runs SpatialTransform on CPU workers); the device
        # stack keeps the cheap transforms. 3D volumes get the Euler-rotation
        # analog (closing the r2 "3D spatial DA omitted" deviation).
        self.host_spatial = None
        # patch size the TRAIN sampler crops: enlarged for rotation/scale so
        # the center crop after the spatial transform sees real content at
        # the corners (reference configure_rotation_dummyDA_mirroring_and_
        # inital_patch_size, nnUNetTrainer.py:375-431 + get_plain_dataloaders
        # loading initial_patch_size); equals plan.patch_size when spatial DA
        # is off (the NoDA variant's get_plain_dataloaders override)
        self.train_patch_size = tuple(plan.patch_size)
        if self.augment_cfg.p_rotation > 0 or self.augment_cfg.p_scaling > 0:
            import dataclasses as _dc

            from ldiffusion_tpu.data.augment import (
                HostSpatialAugmenter,
                HostSpatialAugmenter3D,
                configure_spatial_da,
            )

            spatial = configure_spatial_da(
                plan.patch_size, self.augment_cfg.initial_scale_range)
            self.train_patch_size = spatial.initial_patch_size
            if len(plan.patch_size) == 2:
                # aspect-dependent 2D rotation: ±15° for elongated patches,
                # ±180° otherwise (reference :382-396)
                self.augment_cfg = _dc.replace(
                    self.augment_cfg, rotation_max=spatial.rotation_max[0])
                self.host_spatial = HostSpatialAugmenter(
                    self.augment_cfg, seed=config.seed + 17,
                    data_order=0 if getattr(variant, "spatial_order0_data",
                                            False) else 1,
                    out_size=plan.patch_size)
            else:
                if not spatial.do_dummy_2d:
                    self.augment_cfg = _dc.replace(
                        self.augment_cfg,
                        rotation_max_3d=spatial.rotation_max[0])
                self.host_spatial = HostSpatialAugmenter3D(
                    self.augment_cfg, seed=config.seed + 17,
                    data_order=0 if getattr(variant, "spatial_order0_data",
                                            False) else 1,
                    out_size=plan.patch_size, dummy_2d=spatial.do_dummy_2d)
            self.augment_cfg = _dc.replace(self.augment_cfg,
                                           p_rotation=0.0, p_scaling=0.0)
        self.log = TextLogger(os.path.join(output_dir, "training_log.txt"))
        self.epoch_log = EpochLogger(config.ema_decay)
        self.current_epoch = 0
        self.best_ema: Optional[float] = None
        # --disable_checkpointing (reference run_training.py:246-248)
        self.disable_checkpointing = False

        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        net_cfg = plan.network_config()
        # 3D plans (SegPlan3D — 3d_fullres/3d_lowres/3d_cascade_fullres) build
        # the volumetric net; cascade configs widen in_channels with the
        # prev-stage one-hot (net_cfg.in_channels already accounts for it)
        self.is_3d = len(plan.patch_size) == 3
        if getattr(variant, "norm", "instance") == "batch":
            # nnUNetTrainerBN (reference variants/network_architecture/)
            if self.is_3d:
                raise NotImplementedError("BN variant is 2D-only here")
            import dataclasses as _dc

            net_cfg = _dc.replace(net_cfg, norm="batch")
        if self.is_3d:
            from ldiffusion_tpu.models.dynunet3d import DynUNet3D

            self.net = DynUNet3D(net_cfg, dtype=dtype)
        else:
            self.net = DynUNet(net_cfg, dtype=dtype)
        variables = self.net.init(
            jax.random.key(config.seed),
            jnp.zeros((1, *plan.patch_size, net_cfg.in_channels)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._has_bn = bool(batch_stats)
        # lr is injected per-epoch (PolyLR); inject via optax schedule on step
        # count would misalign with the reference's per-epoch stepping, so the
        # optimizer reads lr from a mutable scale.
        opt_name = getattr(self.variant, "optimizer", "sgd") if self.variant else "sgd"
        if opt_name == "adan":
            # real Adan (core/optim.py) — decay is DECOUPLED inside the
            # update ((θ - lr·u)/(1 + lr·wd), adan_pytorch semantics), so no
            # coupled add_decayed_weights here (reference
            # variants/optimizer/nnUNetTrainerAdan.py:16-19).
            from ldiffusion_tpu.core.optim import adan

            def make_tx(learning_rate):
                return optax.chain(
                    optax.clip_by_global_norm(config.grad_clip),
                    adan(learning_rate, weight_decay=config.weight_decay),
                )
        else:
            if opt_name == "adam":
                inner = lambda learning_rate: optax.adamw(learning_rate, weight_decay=0.0)
            else:
                inner = lambda learning_rate: optax.sgd(learning_rate, momentum=config.momentum,
                                                        nesterov=True)
            # torch order (reference nnUNetTrainer.py:145-146, :907-911): clip
            # the raw grads (clip_grad_norm_ 12), then the optimizer applies
            # coupled L2 (wd*param added to the clipped grad) inside the step.
            def make_tx(learning_rate):
                return optax.chain(
                    optax.clip_by_global_norm(config.grad_clip),
                    optax.add_decayed_weights(config.weight_decay),
                    inner(learning_rate),
                )

        self.tx = optax.inject_hyperparams(make_tx)(learning_rate=config.initial_lr)
        self.weight_decay = config.weight_decay

        params = jax.device_put(params, self.mesh.replicated)
        batch_stats = jax.device_put(batch_stats, self.mesh.replicated)
        opt_state = jax.jit(self.tx.init, out_shardings=None)(params)
        self.state = SegTrainState(params=params, opt_state=opt_state,
                                   step=jnp.zeros((), jnp.int32),
                                   batch_stats=batch_stats)
        # label-regime LUTs, indexed by seg+1 (row 0 = the -1 value — kept for
        # indexing safety, unreachable after the RemoveLabelTransform(-1, 0)
        # mapping in the train/val steps: padding trains as background, like
        # the reference, nnUNetTrainer.py:733): region one-hot maps + loss
        # mask excluding the ignore label
        # (reference label_handling.py:248-322 + DC_and_Focal ignore handling)
        self._region_lut = None
        self._mask_lut = None
        if label_manager is not None:
            labels = list(label_manager.all_labels)
            if label_manager.has_ignore_label:
                labels.append(label_manager.ignore_label)
            max_l = max(labels)
            mask = np.ones(max_l + 2, np.float32)
            if label_manager.has_ignore_label:
                mask[label_manager.ignore_label + 1] = 0.0
            self._mask_lut = jnp.asarray(mask)
            if label_manager.has_regions:
                lut = np.zeros((max_l + 2, label_manager.num_segmentation_heads),
                               np.float32)
                for ri, region in enumerate(label_manager.regions):
                    for lbl in region:
                        lut[lbl + 1, ri] = 1.0
                self._region_lut = jnp.asarray(lut)
        self._train_step = self._make_train_step()
        self._val_step = self._make_val_step()
        dump_debug_json(os.path.join(output_dir, "debug.json"),
                        {"plan": plan.to_json(), "config": config.to_json()})

    # ------------------------------------------------------------------
    def _apply_train(self, params, batch_stats, data):
        """Forward in train mode; returns (outputs, new_batch_stats). BN nets
        mutate running stats; instance-norm nets pass them through."""
        if self._has_bn:
            outputs, upd = self.net.apply(
                {"params": params, "batch_stats": batch_stats}, data,
                train=True, mutable=["batch_stats"])
            return outputs, upd["batch_stats"]
        return self.net.apply({"params": params}, data, train=True), batch_stats

    def _loss(self, params, batch_stats, data, seg_list):
        outputs, new_bs = self._apply_train(params, batch_stats, data)
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]

        loss_name = getattr(self.variant, "loss", "dc_and_ce") if self.variant \
            else "dc_and_ce"
        # loss knobs (nnUNetTrainerDiceCELoss_noSmooth / Topk10LossLS01)
        smooth = getattr(self.variant, "dice_smooth", 1e-5) if self.variant \
            else 1e-5
        label_smoothing = getattr(self.variant, "label_smoothing", 0.0) \
            if self.variant else 0.0

        def one(logits, seg):
            if self._region_lut is not None:
                idx = jnp.clip(seg + 1, 0, self._region_lut.shape[0] - 1)
                return dc_and_focal_sigmoid_loss(
                    logits, self._region_lut[idx], loss_mask=self._mask_lut[idx],
                    batch_dice=self.plan.batch_dice)
            # seg is already RemoveLabelTransform'd (-1 → 0 background); only
            # an explicit ignore label still masks the loss
            if self._mask_lut is not None:   # plain labels with ignore label
                idx = jnp.clip(seg + 1, 0, self._mask_lut.shape[0] - 1)
                mask = self._mask_lut[idx]
                tgt = jnp.where(mask > 0, seg, 0)
            else:
                mask = None
                tgt = seg
            if loss_name == "dice":
                return soft_dice_loss(logits, tgt, loss_mask=mask,
                                      batch_dice=self.plan.batch_dice,
                                      smooth=smooth)
            if loss_name == "ce":
                return robust_cross_entropy(logits, tgt, loss_mask=mask)
            if loss_name == "topk10":
                from ldiffusion_tpu.losses.dice import topk_cross_entropy
                return topk_cross_entropy(logits, tgt,
                                          label_smoothing=label_smoothing,
                                          loss_mask=mask)
            if loss_name == "dc_and_topk10":
                from ldiffusion_tpu.losses.dice import topk_cross_entropy
                dc = soft_dice_loss(logits, tgt, loss_mask=mask,
                                    batch_dice=self.plan.batch_dice,
                                    smooth=smooth)
                return dc + topk_cross_entropy(logits, tgt, loss_mask=mask)
            if loss_name == "dc_and_focal":
                from ldiffusion_tpu.losses.dice import dc_and_focal_loss
                return dc_and_focal_loss(logits, tgt, loss_mask=mask,
                                         batch_dice=self.plan.batch_dice)
            dc = soft_dice_loss(logits, tgt, loss_mask=mask,
                                batch_dice=self.plan.batch_dice, smooth=smooth)
            ce = robust_cross_entropy(logits, tgt, loss_mask=mask)
            return dc + ce

        return deep_supervision_loss(outputs, seg_list, one), new_bs

    def _make_train_step(self):
        batch_sh = self.mesh.sharding((DATA_AXIS, FSDP_AXIS))
        pools = lambda s: (max(s) > 1) if isinstance(s, (tuple, list)) else (s > 1)
        n_ds = sum(1 for s in self.plan.strides if pools(s)) + 1 \
            if self.plan.deep_supervision else 1
        aug = augment_batch_3d if self.is_3d else augment_batch
        # mode-pool one-hot depth must cover region/ignore label VALUES, which
        # can exceed the network head count (LUT rows = max_label + 2)
        n_labels = (self._mask_lut.shape[0] - 1 if self._mask_lut is not None
                    else self.plan.num_classes)

        @partial(jax.jit, donate_argnums=(0,),
                 static_argnames=())
        def step(state: SegTrainState, data, seg, key, lr):
            data, seg = aug(key, data, seg, self.augment_cfg)
            # RemoveLabelTransform(-1, 0) (reference nnUNetTrainer.py:733,776):
            # crop padding AND rotated-out pixels train as BACKGROUND — the
            # net must learn that sliding-window zero-pad borders are
            # background. Runs after spatial DA, before region conversion and
            # DS downsampling, exactly like the reference transform order.
            seg = jnp.maximum(seg, 0)
            seg_list = [seg]
            cur = seg
            for s in self.plan.strides[1:]:
                if pools(s):
                    cur = _downsample_seg(cur, s, n_labels)
                    seg_list.append(cur)
            seg_list = seg_list[:n_ds]
            (loss, new_bs), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, state.batch_stats, data, seg_list)
            updates, opt_state = self.tx.update(grads, _set_lr(state.opt_state, lr),
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return SegTrainState(params, opt_state, state.step + 1, new_bs), loss

        return step

    def _make_val_step(self):
        @jax.jit
        def step(params, batch_stats, data, seg):
            variables = {"params": params}
            if self._has_bn:
                variables["batch_stats"] = batch_stats
            seg = jnp.maximum(seg, 0)  # RemoveLabelTransform(-1, 0), as in train
            logits = self.net.apply(variables, data, train=False)
            if self._region_lut is not None:
                # regions regime: sigmoid heads, per-region tp/fp/fn
                # (reference nnUNetTrainer.py:957-1003 region branch)
                idx = jnp.clip(seg + 1, 0, self._region_lut.shape[0] - 1)
                th = self._region_lut[idx]
                m = self._mask_lut[idx][..., None]
                loss = dc_and_focal_sigmoid_loss(
                    logits, th, loss_mask=self._mask_lut[idx],
                    batch_dice=self.plan.batch_dice)
                ph = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                      ).astype(jnp.float32) * m
                th = th * m
                axes = tuple(range(ph.ndim - 1))
                tp = jnp.sum(ph * th, axis=axes)
                fp = jnp.sum(ph * (1 - th), axis=axes)
                fn = jnp.sum((1 - ph) * th, axis=axes)
                # prepend a dummy background column: the epoch loop's [1:]
                # slice expects head 0 = background in the plain regime
                pad = lambda v: jnp.concatenate([jnp.zeros((1,), v.dtype), v])
                return loss, pad(tp), pad(fp), pad(fn)
            if self._mask_lut is not None:
                idx = jnp.clip(seg + 1, 0, self._mask_lut.shape[0] - 1)
                mask = self._mask_lut[idx] > 0
                tgt = jnp.where(mask, seg, 0)
            else:
                mask = jnp.ones(seg.shape, bool)  # -1 already mapped to bg
                tgt = seg
            loss = soft_dice_loss(logits, tgt, loss_mask=mask.astype(jnp.float32),
                                  batch_dice=self.plan.batch_dice) + \
                robust_cross_entropy(logits, tgt, loss_mask=mask.astype(jnp.float32))
            pred = jnp.argmax(logits, axis=-1)
            c = self.plan.num_classes
            ph = jax.nn.one_hot(pred, c) * mask[..., None]
            th = jax.nn.one_hot(tgt, c) * mask[..., None]
            axes = tuple(range(ph.ndim - 1))  # batch + spatial (2D or 3D)
            tp = jnp.sum(ph * th, axis=axes)
            fp = jnp.sum(ph * (1 - th), axis=axes)
            fn = jnp.sum((1 - ph) * th, axis=axes)
            return loss, tp, fp, fn

        return step

    # ------------------------------------------------------------------
    def run_training(self, train_ds: PreprocessedDataset, val_ds: PreprocessedDataset,
                     num_epochs: Optional[int] = None,
                     continue_training: bool = False):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        if continue_training:
            # --c semantics (reference run_training.py:76-86): resume from
            # checkpoint_latest (falling back to best/final) when present
            for name in ("checkpoint_latest.pkl", "checkpoint_best.pkl",
                         "checkpoint_final.pkl"):
                path = os.path.join(self.output_dir, name)
                if os.path.exists(path):
                    self.load_checkpoint(path)
                    self.log(f"resumed from {name} at epoch {self.current_epoch}")
                    break
        from ldiffusion_tpu.data.prefetch import Prefetcher

        # sampling mode (nnUNetTrainer_probabilisticOversampling family):
        # per-sample bernoulli at the variant's rate — the base variant uses
        # the positional rule's effective percentage
        probabilistic = bool(getattr(self.variant, "probabilistic_oversampling",
                                     False))
        oversample = cfg.oversample_fg
        if getattr(self.variant, "oversample_fg", None) is not None:
            oversample = self.variant.oversample_fg
        elif probabilistic:
            oversample = PatchSampler.effective_oversample_percent(
                self.plan.batch_size, cfg.oversample_fg)

        if getattr(self.variant, "no_data_loading", False):
            # Benchmark_5epochs_noDataLoading (reference
            # variants/benchmarking/nnUNetTrainerBenchmark_5epochs_noDataLoading.py):
            # one synthetic batch, reused every iteration — times the pure
            # train step without the input pipeline
            rng = np.random.default_rng(cfg.seed)
            in_ch = self.net.config.in_channels
            dummy_data = rng.random(
                (self.plan.batch_size, *self.plan.patch_size, in_ch),
                np.float32)
            dummy_seg = rng.integers(
                0, max(2, self.plan.num_classes),
                (self.plan.batch_size, *self.plan.patch_size)).astype(np.int32)
            train_iter = iter(lambda: (dummy_data, dummy_seg), None)
            val_iter = iter(lambda: (dummy_data, dummy_seg), None)
        else:
            base_iter = iter(PatchSampler(
                train_ds, self.train_patch_size, self.plan.batch_size,
                oversample, seed=cfg.seed,
                probabilistic_oversampling=probabilistic))
            if self.host_spatial is not None:
                # spatial transform + center crop back to plan.patch_size
                base_iter = (self.host_spatial(d, s) for d, s in base_iter)
            train_iter = Prefetcher(base_iter)
            val_iter = Prefetcher(iter(PatchSampler(
                val_ds, self.plan.patch_size, self.plan.batch_size,
                oversample, seed=cfg.seed + 1,
                probabilistic_oversampling=probabilistic)))
        key = jax.random.key(cfg.seed)
        os.makedirs(self.output_dir, exist_ok=True)

        for epoch in range(self.current_epoch, num_epochs):
            t0 = time.time()
            if self.variant is not None:
                from ldiffusion_tpu.segmentor.variants import lr_at_epoch
                lr = lr_at_epoch(self.variant, epoch, num_epochs)
            else:
                lr = poly_lr(cfg.initial_lr, epoch, num_epochs)
            self.epoch_log.log("lr", lr, epoch)
            # ---- train ----
            tl = 0.0
            for _ in range(cfg.iters_per_epoch):
                data, seg = next(train_iter)
                key, sub = jax.random.split(key)
                data = self.mesh.shard_batch(jnp.asarray(data))
                seg = self.mesh.shard_batch(jnp.asarray(seg))
                self.state, loss = self._train_step(self.state, data, seg, sub,
                                                    jnp.float32(lr))
                tl += float(loss)
            self.epoch_log.log("train_loss", tl / cfg.iters_per_epoch, epoch)

            # ---- validate ----
            vl = 0.0
            # regions regime prepends a dummy background column (the [1:]
            # foreground slice below then covers exactly the region heads)
            n_heads = self.plan.num_classes + (1 if self._region_lut is not None
                                               else 0)
            tp = np.zeros(n_heads)
            fp = np.zeros(n_heads)
            fn = np.zeros(n_heads)
            for _ in range(cfg.val_iters_per_epoch):
                data, seg = next(val_iter)
                data = self.mesh.shard_batch(jnp.asarray(data))
                seg = self.mesh.shard_batch(jnp.asarray(seg))
                l, tpi, fpi, fni = self._val_step(self.state.params,
                                                  self.state.batch_stats,
                                                  data, seg)
                vl += float(l)
                tp += np.asarray(tpi)
                fp += np.asarray(fpi)
                fn += np.asarray(fni)
            self.epoch_log.log("val_loss", vl / cfg.val_iters_per_epoch, epoch)
            # global per-class dice over the epoch (reference :994-1025)
            dice_pc = 2 * tp[1:] / np.maximum(2 * tp[1:] + fp[1:] + fn[1:], 1e-8)
            mean_fg = float(np.mean(dice_pc))
            self.epoch_log.log("mean_fg_dice", mean_fg, epoch)
            ema = self.epoch_log.get("ema_fg_dice", epoch)
            self.epoch_log.log("epoch_time", time.time() - t0, epoch)

            self.log(f"Epoch {epoch}: loss {tl / cfg.iters_per_epoch:.4f} "
                     f"val {vl / cfg.val_iters_per_epoch:.4f} "
                     f"pseudo-dice {mean_fg:.4f} (EMA {ema:.4f}) "
                     f"lr {lr:.5f} [{time.time() - t0:.1f}s]")

            # ---- checkpoints (reference :1030-1054; --disable_checkpointing
            # skips every save, run_training.py:246-248) ----
            self.current_epoch = epoch + 1
            if self.best_ema is None or ema > self.best_ema:
                self.best_ema = ema
                if not self.disable_checkpointing:
                    self.save_checkpoint(os.path.join(self.output_dir, "checkpoint_best.pkl"))
            if not self.disable_checkpointing and \
                    ((epoch + 1) % cfg.save_every == 0 or epoch == num_epochs - 1):
                self.save_checkpoint(os.path.join(self.output_dir, "checkpoint_latest.pkl"))
            self.epoch_log.plot_progress(os.path.join(self.output_dir, "progress.png"))

        for it in (train_iter, val_iter):
            if hasattr(it, "close"):
                it.close()
        if not self.disable_checkpointing:
            self.save_checkpoint(os.path.join(self.output_dir, "checkpoint_final.pkl"))
        self._write_benchmark_result()

    def _write_benchmark_result(self):
        """benchmark_result.json analog (reference
        ``variants/benchmarking/nnUNetTrainerBenchmark_5epochs.py:8-65``):
        fastest epoch time + environment info."""
        import json as _json

        import jax as _jax

        times = [t for t in self.epoch_log.data.get("epoch_time", [])
                 if t == t]  # drop NaN
        if not times:
            return
        result = {
            "fastest_epoch_s": min(times),
            "mean_epoch_s": sum(times) / len(times),
            "num_epochs": len(times),
            "jax_version": _jax.__version__,
            "backend": _jax.default_backend(),
            "device": str(_jax.devices()[0]),
            "num_devices": _jax.device_count(),
            "batch_size": self.plan.batch_size,
            "patch_size": list(self.plan.patch_size),
        }
        if is_main_process():
            with open(os.path.join(self.output_dir, "benchmark_result.json"), "w") as f:
                _json.dump(result, f, indent=2)

    # ------------------------------------------------------------------
    def perform_actual_validation(self, val_images, val_labels, gt_dir=None,
                                  determine_pp: bool = True,
                                  normalize: bool = True,
                                  save_npz: bool = False):
        """Final validation: sliding-window predict every val case, write
        PNGs + nnUNet-style summary.json, optionally determine connected-
        component postprocessing (reference ``nnUNetTrainer.py:1119-1246`` +
        ``determine_postprocessing``). val_images: list of (H, W, C) arrays
        (already diffusion-transformed); val_labels: list of (H, W) ints.
        Multi-host: cases are interleaved by process index (reference
        ``nnUNetTrainer.py:1138-1139``).

        normalize: z-score the images before prediction. Pass False when the
        cases come from the PREPROCESSED store (already normalized there —
        re-normalizing would distort non-zscore schemes and, for the cascade
        config, corrupt the appended {0,1} prev-stage one-hot channels).

        save_npz: additionally write each case's probabilities as
        ``case_NNN.npz`` next to its segmentation — the ``--npz`` flag that
        feeds find_best_configuration's ensembling (reference
        ``run_training.py:236-238`` → ``nnUNetTrainer.py:1152-1158``)."""
        import jax as _jax
        import numpy as _np
        from PIL import Image as _Image

        from ldiffusion_tpu.evaluate import compute_metrics_on_folder
        from ldiffusion_tpu.segmentor.postprocess import (
            determine_postprocessing,
            save_postprocessing,
        )
        from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

        out_dir = os.path.join(self.output_dir, "validation")
        os.makedirs(out_dir, exist_ok=True)
        gt_out = gt_dir or os.path.join(self.output_dir, "validation_gt")
        os.makedirs(gt_out, exist_ok=True)
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        pvars = ({"params": self.state.params,
                  "batch_stats": self.state.batch_stats}
                 if self._has_bn else self.state.params)
        # the label manager routes regions/ignore regimes through the
        # inference nonlin + regions_class_order painting (reference
        # predict_from_raw_data.py:459-494 → label_handling.py:128-176) —
        # argmax on sigmoid region heads would be WRONG.
        # Mirror TTA follows the TRAINING mirror config (reference
        # inference_allowed_mirroring_axes, nnUNetTrainer.py:1161-1167):
        # NoMirroring/NoDA validate without flips; onlyMirror01 restricts
        # axes. Shared with the CLI predict paths via inference_mirror_config.
        from ldiffusion_tpu.segmentor.variants import inference_mirror_config

        use_mirroring, mirror_axes = inference_mirror_config(
            self.variant, len(self.plan.patch_size))
        predictor = SlidingWindowPredictor(self.plan, pvars, dtype=dtype,
                                           label_manager=self.label_manager,
                                           use_mirroring=use_mirroring,
                                           mirror_axes=mirror_axes)
        n_proc = _jax.process_count()
        idx = _jax.process_index()
        for i, (img, lab) in enumerate(zip(val_images, val_labels)):
            if i % n_proc != idx:
                continue  # interleaved case sharding across hosts
            img = _np.asarray(img, _np.float32)
            if save_npz:
                from ldiffusion_tpu.segmentor.export import (
                    save_probabilities_npz,
                )

                # one prediction pass: logits feed both the npz and the seg
                logits = predictor.predict_logits(img, normalize=normalize)
                save_probabilities_npz(logits,
                                       os.path.join(out_dir, f"case_{i:03d}.npz"),
                                       label_manager=self.label_manager)
                seg = (self.label_manager.convert_logits_to_segmentation(logits)
                       if self.label_manager is not None
                       else _np.argmax(logits, axis=-1).astype(_np.uint8))
            else:
                seg = predictor.predict(img, normalize=normalize)
            if seg.ndim == 3:   # volumetric configs: .npy cases
                _np.save(os.path.join(out_dir, f"case_{i:03d}.npy"), seg)
                _np.save(os.path.join(gt_out, f"case_{i:03d}.npy"),
                         _np.asarray(lab, _np.int16))
            else:
                _Image.fromarray(seg).save(
                    os.path.join(out_dir, f"case_{i:03d}.png"))
                _Image.fromarray(_np.asarray(lab, _np.uint8)).save(
                    os.path.join(gt_out, f"case_{i:03d}.png"))
        # Multi-host: barrier so every rank's cases are on the shared FS
        # before rank 0 scores the folder; all other ranks score NOTHING
        # (the reference barriers and computes metrics on rank 0 only,
        # nnUNetTrainer.py:1226-1243).
        if n_proc > 1:
            _validation_barrier("final_validation_cases_written")
        summary_path = os.path.join(out_dir, "summary.json")
        lm = self.label_manager
        if idx == 0:
            summary = compute_metrics_on_folder(
                out_dir, gt_out, self.plan.num_classes,
                output_file=summary_path,
                regions_or_labels=(lm.labels_or_regions_for_eval
                                   if lm is not None else None),
                ignore_label=lm.ignore_label if lm is not None else None)
            if determine_pp:
                # pp is determined over ALL ranks' cases, reloaded from the
                # shared validation folder; the CM-based scorer needs a class
                # count covering every VALUE appearing in preds/gts — painted
                # region labels and the ignore label can exceed the head count
                def _read_case(d, f):
                    if f.endswith(".npy"):
                        return _np.load(os.path.join(d, f))
                    return _np.asarray(_Image.open(os.path.join(d, f)))

                preds, gts = [], []
                for f in sorted(os.listdir(out_dir)):
                    if f.endswith((".png", ".npy")):
                        preds.append(_read_case(out_dir, f))
                        gts.append(_read_case(gt_out, f))
                if preds:
                    n_pp = self.plan.num_classes
                    ig = None
                    if lm is not None:
                        vals = list(lm.all_labels)
                        if lm.has_ignore_label:
                            vals.append(lm.ignore_label)
                            ig = lm.ignore_label
                        n_pp = max(vals) + 1
                    steps = determine_postprocessing(preds, gts, n_pp,
                                                     ignore_label=ig)
                    save_postprocessing(steps, os.path.join(
                        self.output_dir, "postprocessing.json"))
        if n_proc > 1:
            _validation_barrier("final_validation_summary_written")
        if idx != 0:
            with open(summary_path) as f:
                summary = json.load(f)
        self.log(f"final validation foreground dice: "
                 f"{summary['foreground_mean']['Dice']:.4f}")
        return summary

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        save_pytree(path, {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "batch_stats": self.state.batch_stats,
            "epoch": self.current_epoch,
            "best_ema": self.best_ema,
            "logger": self.epoch_log.state_dict(),
            "plan": self.plan.to_json(),
        })

    def load_pretrained(self, path: str):
        """-pretrained_weights semantics (reference
        ``run/run_training.py:71-99`` maybe_load_checkpoint →
        ``load_pretrained_weights.py``): shape-matched tensors from another
        run's checkpoint are transferred into the FRESH model; optimizer
        state, epoch counter and logger are NOT restored."""
        from ldiffusion_tpu.segmentor.pretrained import (
            transfer_pretrained_weights,
        )

        ck = load_pytree(path)
        src = ck["params"] if isinstance(ck, dict) and "params" in ck else ck
        new_params, transferred, _ = transfer_pretrained_weights(
            self.state.params, src)
        assert transferred, f"no shape-matched tensors found in {path}"
        self.state = self.state._replace(
            params=jax.device_put(new_params, self.mesh.replicated))
        self.log(f"pretrained weights: transferred {len(transferred)} "
                 f"tensors from {path}")

    def load_checkpoint(self, path: str):
        ck = load_pytree(path)
        params = jax.device_put(ck["params"], self.mesh.replicated)
        opt_state = jax.tree_util.tree_map(jnp.asarray, ck["opt_state"])
        batch_stats = jax.device_put(ck.get("batch_stats", {}),
                                     self.mesh.replicated)
        self.state = SegTrainState(params=params, opt_state=opt_state,
                                   step=jnp.asarray(ck["step"]),
                                   batch_stats=batch_stats)
        self.current_epoch = ck["epoch"]
        self.best_ema = ck["best_ema"]
        self.epoch_log.load_state_dict(ck["logger"])


def _downsample_seg(seg, s, num_labels: int):
    """Majority-vote (mode) pool of int labels over per-axis windows.

    Replaces stride-slice decimation, which aliases away thin structures; the
    reference downsamples the seg with interpolation for deep supervision
    (nnUNet DS downsampling transform, ``nnUNetTrainer.py:673-795``). The -1
    outside-crop/ignore value votes as its own channel and wins only when it
    dominates the window. seg: (B, *spatial) int; s: int (isotropic 2D) or
    per-axis tuple (3D). ``num_labels`` must cover the LARGEST label value
    (region/ignore labels may exceed the network head count — an undersized
    one-hot would silently drop their votes)."""
    if isinstance(s, int):
        s = (s,) * (seg.ndim - 1)
    window = (1,) + tuple(s) + (1,)
    onehot = jax.nn.one_hot(seg + 1, num_labels + 1, dtype=jnp.float32)
    pooled = jax.lax.reduce_window(onehot, 0.0, jax.lax.add,
                                   window, window, "VALID")
    return (jnp.argmax(pooled, axis=-1) - 1).astype(seg.dtype)


def _set_lr(opt_state, lr):
    """Update the injected learning_rate hyperparam.

    ``self.tx`` is ``inject_hyperparams`` wrapped around the WHOLE chain, so
    the state is an ``InjectHyperparamsState`` whose top-level ``hyperparams``
    dict is the documented mutation point (no positional indexing into the
    chain's inner states)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return opt_state._replace(hyperparams=hp)
