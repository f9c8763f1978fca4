"""Stage-1 Laplace warm-up trainer (reference ``ldiffusion.py:121-295``).

The reference wraps UNet+projection in DeepSpeed ZeRO-3 with CPU offload
(``ldiffusion.py:165-193``). Here the same memory behavior comes from FSDP
via ``jax.sharding``: UNet params and AdamW state are sharded over the
``fsdp`` mesh axis, the batch over ``data``; XLA schedules the all-gathers /
reduce-scatters on ICI. bf16 compute + per-scan-step rematerialization
replace CPU offload — no host round-trips in the hot loop.

One ``train_step`` = the full timestep trajectory (a ``lax.scan``), the
InfoNCE+content loss, backward, global-clip(1.0), AdamW update — a single
XLA program. The scalar loss is returned globally reduced (pjit semantics),
replacing the reference's explicit ``all_reduce`` (``ldiffusion.py:57-64``).

Faithful hyperparameters: 10 epochs, AdamW lr 1e-5 β(0.9,0.999) wd 0.01,
grad clip 1.0, ``num_inference_steps/5`` trajectory steps, text prompt
"A pathological slide", save-on-best-loss of UNet+projection.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ldiffusion_tpu.core.config import DiffusionTrainConfig
from ldiffusion_tpu.core.dist import DATA_AXIS, FSDP_AXIS, MeshContext
from ldiffusion_tpu.core.logging import CSVLogger, TextLogger, is_main_process
from ldiffusion_tpu.diffusion.pipeline import SDComponents, trajectory_features
from ldiffusion_tpu.losses.infonce import InfoNceLoss, contrastive_loss
from ldiffusion_tpu.models.convert import save_unet_dir


class TrainState(NamedTuple):
    params: dict      # {"unet": ..., "proj": ...} — trainable
    opt_state: tuple
    step: jax.Array


class DiffusionWarmupTrainer:
    def __init__(self, components: SDComponents, config: DiffusionTrainConfig,
                 mesh: MeshContext, work_dir: str = "train_save",
                 info_nce: Optional[InfoNceLoss] = None,
                 fsdp_min_size: int = 2 ** 18):
        self.c = components
        self.cfg = config
        self.mesh = mesh
        self.fsdp_min_size = fsdp_min_size
        self.work_dir = work_dir
        self.log = TextLogger()
        self.info_nce = info_nce or InfoNceLoss.create(num_classes=config.num_classes)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adamw(config.learning_rate, b1=config.betas[0], b2=config.betas[1],
                        eps=config.eps, weight_decay=config.weight_decay),
        )
        self._build_sharded_state()
        self._train_step = self._make_train_step()

    # -- state ----------------------------------------------------------------
    def _build_sharded_state(self):
        trainable = {"unet": self.c.params["unet"], "proj": self.c.params["proj"]}
        frozen = {"vae": self.c.params["vae"], "text": self.c.params["text"]}
        pfn = self.mesh.param_sharding_fn(self.fsdp_min_size)
        self.param_shardings = jax.tree_util.tree_map(pfn, trainable)
        self.frozen_shardings = jax.tree_util.tree_map(pfn, frozen)
        self.frozen = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), frozen, self.frozen_shardings
        )
        # copy=True: the train step donates the state, so the trainable
        # buffers must not alias the caller's arrays
        trainable = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.array(x, copy=True), s), trainable,
            self.param_shardings
        )
        opt_shape = jax.eval_shape(self.tx.init, trainable)
        self.opt_shardings = jax.tree_util.tree_map(pfn, opt_shape)
        opt_state = jax.jit(self.tx.init, out_shardings=self.opt_shardings)(trainable)
        self.state = TrainState(params=trainable, opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32))
        self.state_shardings = TrainState(params=self.param_shardings,
                                          opt_state=self.opt_shardings,
                                          step=self.mesh.replicated)

    # -- step -----------------------------------------------------------------
    def _loss_fn(self, trainable, frozen, images, labels, key):
        params = {"unet": trainable["unet"], "proj": trainable["proj"],
                  "vae": frozen["vae"], "text": frozen["text"]}
        steps = max(1, int(self.cfg.num_inference_steps / 5))
        k_noise, k_contrast = jax.random.split(key)
        traj, final_rgb = trajectory_features(
            self.c, params, images, k_noise, steps, remat=self.cfg.remat,
            context_sharding=self.mesh.replicated,
        )
        # content loss: reference upsamples decode 64→1024 then VGG resizes to
        # 224 (ldiffusion.py:251, loss.py:35-36) — a pure bilinear chain, so we
        # go 64→224 directly on both sides.
        content = self.info_nce.content_loss(images, final_rgb)
        contrast = contrastive_loss(traj, labels, k_contrast,
                                    self.info_nce.temperature,
                                    self.info_nce.num_negatives,
                                    self.info_nce.num_anchors,
                                    self.info_nce.num_classes)
        return content + contrast, {"content": content, "contrast": contrast}

    def _make_train_step(self):
        batch_sharding = self.mesh.sharding((DATA_AXIS, FSDP_AXIS))

        @partial(jax.jit,
                 in_shardings=(self.state_shardings, self.frozen_shardings,
                               batch_sharding, batch_sharding, self.mesh.replicated),
                 out_shardings=(self.state_shardings, self.mesh.replicated),
                 donate_argnums=(0,))
        def step(state: TrainState, frozen, images, labels, key):
            (loss, aux), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                state.params, frozen, images, labels, key
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
            metrics = {"loss": loss, **aux}
            return new_state, metrics

        return step

    # -- loop -----------------------------------------------------------------
    def train(self, train_iter, steps_per_epoch: int, num_epochs: Optional[int] = None,
              save_dir: Optional[str] = None) -> str:
        """train_iter yields (images (B,64,64,3) float32 normalized,
        labels (B,64,64) int32). Returns the checkpoint directory
        (mirrors ``train_ldiffusion`` returning save_path,
        reference ``ldiffusion.py:295``)."""
        num_epochs = num_epochs or self.cfg.num_epochs
        date = time.strftime("%y_%m_%d")
        save_dir = save_dir or os.path.join(self.work_dir, "unet", date)
        csv_log = CSVLogger(os.path.join(self.work_dir, "loss", date, "contrast_loss.csv"))
        best = 100.0  # reference's initial `checkpoint` (ldiffusion.py:196)
        key = jax.random.key(self.cfg.seed)

        for epoch in range(num_epochs):
            t0 = time.time()
            total = 0.0
            for it in range(steps_per_epoch):
                images, labels = next(train_iter)
                key, sub = jax.random.split(key)
                images = self.mesh.shard_batch(jnp.asarray(images))
                labels = self.mesh.shard_batch(jnp.asarray(labels))
                self.state, metrics = self._train_step(self.state, self.frozen,
                                                       images, labels, sub)
                total += float(metrics["loss"])
            cur = total / max(1, steps_per_epoch)
            dt = time.time() - t0
            self.log(f"Epoch [{epoch + 1}/{num_epochs}], Loss: {cur:.4f}, "
                     f"Elapsed Time: {dt:.1f}s")
            if cur < best:
                best = cur
                self.save(save_dir)
            csv_log.append(epoch + 1, cur)
        return save_dir

    def save(self, save_dir: str):
        """Gather sharded params to host and save (sharded-native save needs
        no ZeRO-style GatheredParameters — jax.device_get reassembles)."""
        from ldiffusion_tpu.core.checkpoint import _to_host

        # all-process gather first (non-addressable FSDP shards), rank-0 write
        params = jax.tree_util.tree_map(_to_host, self.state.params)
        if is_main_process():
            save_unet_dir(save_dir, self.c.unet_config, params["unet"], proj=params["proj"])
            self.log(f"saved checkpoint to {save_dir}")
