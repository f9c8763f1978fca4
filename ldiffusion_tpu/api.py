"""Public API facade + CLI.

Mirrors the reference's user surface (``ldiffusion.py:19-331``):

    model = LDiffusionModel(diffusion_path, level="tissue")
    model.train(args, component="all"|"ldiffusion"|"segmentor",
                ldiffusion_weight=...)
    decoded, mask = model.inference(image_path, ldiffusion_weight,
                                    segmentor_weight, num_classes)

CLI: ``python -m ldiffusion_tpu.ldiffusion --diffusion-path ... --image-dir
... --label-dir ... --num-epochs N --batch-size B --num-inference-steps S
--num-classes C``.

Differences from the reference (all deliberate, TPU-native):
* no DeepSpeed/NCCL setup — ``jax.distributed`` + a device mesh
  (``core/dist.py``); ``--local_rank`` is accepted and ignored.
* the segmentor is this framework's planner/trainer/predictor stack, not a
  vendored nnUNetv2 (same behavior surface: plan → preprocess → train →
  sliding-window predict).
* ``diffusion_path="random:tiny"`` builds a randomly-initialized tiny model
  bundle (tests / smoke runs without SD checkpoint files).
"""
from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from ldiffusion_tpu.core.config import (
    DiffusionTrainConfig,
    LDiffusionConfig,
    MeshConfig,
    SegmentorTrainConfig,
)
from ldiffusion_tpu.core.dist import MeshContext, make_mesh, maybe_init_multihost
from ldiffusion_tpu.core.logging import TextLogger
from ldiffusion_tpu.data.dataset import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    SegmentationDataset,
    list_pairs,
    load_image,
    split_dataset,
)


def parse_args(argv=None):
    """reference ``ldiffusion.py:19-29``."""
    p = argparse.ArgumentParser(description="Diffusion model training parameters")
    p.add_argument("--local_rank", type=int, default=int(os.environ.get("LOCAL_RANK", -1)))
    p.add_argument("--diffusion-path", type=str, required=True,
                   help="stable diffusion base model path")
    p.add_argument("--image-dir", type=str, required=True)
    p.add_argument("--label-dir", type=str, required=True)
    p.add_argument("--num-epochs", type=int, required=True)
    p.add_argument("--batch-size", type=int, required=True)
    p.add_argument("--num-inference-steps", type=int, required=True)
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--level", type=str, default="tissue", choices=["tissue", "cell"])
    p.add_argument("--component", type=str, default="all",
                   choices=["all", "ldiffusion", "segmentor"])
    return p.parse_args(argv)


class LDiffusionModel:
    """Top-level trainer/inferencer (reference ``ldiffusion.py:31-324``)."""

    def __init__(self, diffusion_path: str, level: str, local_rank: int = -1,
                 mesh: Optional[MeshContext] = None, components=None,
                 work_dir: str = "train_save",
                 diffusion_config: Optional[DiffusionTrainConfig] = None,
                 segmentor_config: Optional[SegmentorTrainConfig] = None):
        del local_rank  # torch-ism; accepted for signature parity
        maybe_init_multihost()
        self.level = level
        self.diffusion_path = diffusion_path
        self.mesh = mesh or make_mesh(MeshConfig())
        self.work_dir = work_dir
        self.log = TextLogger()
        self.diffusion_config = diffusion_config
        self.segmentor_config = segmentor_config
        self._components = components  # lazily loaded SDComponents

    # ------------------------------------------------------------------
    def _load_components(self, unet_override_dir: Optional[str] = None):
        from ldiffusion_tpu.diffusion.pipeline import SDComponents
        import jax.numpy as jnp

        if self._components is not None and unet_override_dir is None:
            return self._components
        if self.diffusion_path.startswith("random:"):
            comps = SDComponents.random(image_size=64)
            if unet_override_dir:
                from ldiffusion_tpu.models.convert import load_unet_dir

                cfg, params, proj = load_unet_dir(unet_override_dir)
                comps.params["unet"] = params
                if proj is not None:
                    comps.params["proj"] = proj
        else:
            comps = SDComponents.load(self.diffusion_path, dtype=jnp.bfloat16,
                                      unet_override_dir=unet_override_dir)
        self._components = comps
        return comps

    def load_data(self, image_dir: str, label_dir: str, train_ratio: float = 0.7,
                  seed: int = 0):
        """70/30 split (reference ``ldiffusion.py:72-119``)."""
        images, labels = list_pairs(image_dir, label_dir)
        tr_i, tr_l, te_i, te_l = split_dataset(images, labels, train_ratio, seed)
        train = SegmentationDataset(tr_i, tr_l, self.level)
        val = SegmentationDataset(te_i, te_l, self.level)
        return train, val

    # ------------------------------------------------------------------
    def train(self, args, component: str = "all", ldiffusion_weight: Optional[str] = None):
        """component ∈ {all, ldiffusion, segmentor} (reference
        ``ldiffusion.py:297-315``). Returns the final weight paths dict."""
        train_ds, val_ds = self.load_data(args.image_dir, args.label_dir)
        out = {}
        if component in ("all", "ldiffusion"):
            self.log("Starting LDiffusion warming up...")
            ldiffusion_weight = self.train_ldiffusion(args, train_ds)
            out["ldiffusion"] = ldiffusion_weight
        if component in ("all", "segmentor"):
            self.log("Starting Segmentor training...")
            assert ldiffusion_weight, "segmentor training needs ldiffusion_weight"
            seg_epochs = max(1, args.num_epochs - 10)  # reference :311
            if self.level == "tissue":
                out["segmentor"] = self.train_tissue(
                    seg_epochs, ldiffusion_weight, args.num_classes, train_ds, val_ds)
            elif self.level == "cell":
                out["segmentor"] = self.train_cell(
                    seg_epochs, ldiffusion_weight, args.num_classes, train_ds, val_ds)
            else:
                raise ValueError("Invalid level specified. Choose 'tissue' or 'cell'.")
        return out

    # -- stage 1 --------------------------------------------------------
    def train_ldiffusion(self, args, train_ds: SegmentationDataset) -> str:
        from ldiffusion_tpu.train.ldiffusion import DiffusionWarmupTrainer

        comps = self._load_components()
        cfg = self.diffusion_config or DiffusionTrainConfig(
            batch_size=args.batch_size,
            num_inference_steps=args.num_inference_steps,
            num_classes=getattr(args, "num_classes", None),
        )
        trainer = DiffusionWarmupTrainer(comps, cfg, self.mesh, work_dir=self.work_dir)
        steps = max(1, len(train_ds) // max(1, args.batch_size))
        it = train_ds.iter_batches(args.batch_size, image_size=cfg.latent_size,
                                   label_size=cfg.latent_size)
        return trainer.train(it, steps_per_epoch=steps)

    # -- stage 2: tissue -------------------------------------------------
    def _prepare_tissue(self, ldiffusion_weight: str, num_classes: int,
                        train_ds: SegmentationDataset,
                        val_ds: SegmentationDataset):
        """Shared fold-independent setup: diffusion-transform the dataset,
        fingerprint, plan, preprocess ALL train cases once. Returns a dict
        consumed by :meth:`_train_tissue_fold`."""
        from ldiffusion_tpu.segmentor.dataset_builder import (
            DiffusionTransform,
            build_transformed_dataset,
            load_transformed_dataset,
        )
        from ldiffusion_tpu.segmentor.fingerprint import (
            extract_fingerprint,
            verify_dataset_integrity,
        )
        from ldiffusion_tpu.segmentor.planner import plan_experiment
        from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

        comps = self._load_components(unet_override_dir=ldiffusion_weight)
        self.log("\033[32m[LDiffusion] Preparing data by L-Diffusion...\033[0m")
        transform = DiffusionTransform(comps)
        raw_root = os.path.join(self.work_dir, "seg_raw")
        image_size = 1024 if not self.diffusion_path.startswith("random:") else 64
        num, ds_path = build_transformed_dataset(
            train_ds.image_paths, train_ds.label_paths,
            val_ds.image_paths, val_ds.label_paths,
            num_classes, self.level, transform, raw_root, image_size=image_size)

        self.log("\033[32m[Segmentor] Data preprocessing and plan generation"
                 " in progress...\033[0m")
        images, labels = load_transformed_dataset(ds_path, "Tr")
        problems = verify_dataset_integrity(images, labels, num_classes)
        if problems:
            raise ValueError(f"dataset integrity check failed: {problems}")
        fp = extract_fingerprint(images, labels)
        plan = plan_experiment(fp, num_classes)
        out_dir = os.path.join(self.work_dir, "segmentor", f"Dataset{num:03d}")
        plan.save(os.path.join(out_dir, "plans.json"))
        pp_all = PreprocessedDataset.build(images, labels, num_classes)
        return {"plan": plan, "out_dir": out_dir, "pp_all": pp_all,
                "ds_path": ds_path, "num_classes": num_classes}

    def _train_tissue_fold(self, prep: dict, epochs: int, fold) -> str:
        """Train ONE cross-validation fold (reference ``do_split`` +
        ``get_tr_and_val_datasets``, ``nnUNetTrainer.py:513-600``): the 5-fold
        seeded split is generated once and persisted as ``splits_final.json``
        next to ``plans.json``; checkpoints land in ``fold_<f>/`` (the
        reference's per-fold result folders, ``run/run_training.py``)."""
        from ldiffusion_tpu.segmentor.dataset_builder import load_transformed_dataset
        from ldiffusion_tpu.segmentor.splits import do_split
        from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

        plan, out_dir, pp_all = prep["plan"], prep["out_dir"], prep["pp_all"]
        splits_file = os.path.join(out_dir, "splits_final.json")
        tr_keys, va_keys = do_split(pp_all.keys(), fold, splits_file,
                                    log=self.log)
        pp_train = pp_all.subset(tr_keys)
        pp_val = pp_all.subset(va_keys)

        self.log(f"\033[32m[Segmentor] Training fold {fold} "
                 f"({len(tr_keys)} train / {len(va_keys)} val cases)...\033[0m")
        cfg = self.segmentor_config or SegmentorTrainConfig(num_epochs=epochs)
        fold_dir = os.path.join(out_dir, f"fold_{fold}")
        trainer = SegmentorTrainer(plan, cfg, self.mesh, output_dir=fold_dir)
        trainer.run_training(pp_train, pp_val, num_epochs=epochs)
        # final validation: sliding-window over the transformed HELD-OUT 30%
        # split (imagesTs, from val_ds) — never training-set images —
        # summary.json + postprocessing determination (reference
        # nnUNetTrainer.py:1119-1246 on_train_end).
        val_images, val_labels = load_transformed_dataset(prep["ds_path"], "Ts")
        if not val_images:  # no held-out cases: fall back to the val fold
            val_images = [pp_all[k].data for k in va_keys]
            val_labels = [np.maximum(pp_all[k].seg, 0) for k in va_keys]
        try:
            trainer.perform_actual_validation(val_images, val_labels)
        except Exception as e:  # validation must not lose the trained model
            self.log(f"final validation failed: {e}")
        return out_dir

    def train_tissue(self, epochs: int, ldiffusion_weight: str, num_classes: int,
                     train_ds: SegmentationDataset, val_ds: SegmentationDataset,
                     fold=0) -> str:
        prep = self._prepare_tissue(ldiffusion_weight, num_classes,
                                    train_ds, val_ds)
        return self._train_tissue_fold(prep, epochs, fold)

    def train_tissue_all_folds(self, epochs: int, ldiffusion_weight: str,
                               num_classes: int, train_ds: SegmentationDataset,
                               val_ds: SegmentationDataset,
                               folds=(0, 1, 2, 3, 4)) -> str:
        """Train every CV fold (the ``nnUNetv2_train`` loop over folds the
        reference readme prescribes); inference then fold-ensembles the
        per-fold checkpoints (``SlidingWindowPredictor.from_checkpoints``)."""
        prep = self._prepare_tissue(ldiffusion_weight, num_classes,
                                    train_ds, val_ds)
        for f in folds:
            self._train_tissue_fold(prep, epochs, f)
        return prep["out_dir"]

    # -- stage 2: cell ----------------------------------------------------
    def train_cell(self, epochs: int, ldiffusion_weight: str, num_classes: int,
                   train_ds: SegmentationDataset, val_ds: SegmentationDataset) -> str:
        from ldiffusion_tpu.cell.classifier import CellSegClassifier, CellTrainer
        from ldiffusion_tpu.segmentor.dataset_builder import DiffusionTransform

        comps = self._load_components(unet_override_dir=ldiffusion_weight)
        transform = DiffusionTransform(comps)
        size = 1024 if not self.diffusion_path.startswith("random:") else 64

        def pairs(ds):
            out = []
            for i in range(len(ds)):
                img, lab = ds.get(i, image_size=size)
                aug = transform(img[None])[0]  # [0,1] transformed image
                out.append((aug, lab.astype(np.int32)))
            return out

        self.log("Cache L-Diffusion Augmented Inputs...")
        model = CellSegClassifier(num_classes)
        trainer = CellTrainer(model)
        return trainer.train(pairs(train_ds), pairs(val_ds), epochs,
                             save_dir=os.path.join(self.work_dir, "cellclassifier"))

    # ------------------------------------------------------------------
    def inference(self, image_path: str, ldiffusion_weight: str, segmentor_weight: str,
                  num_classes: int) -> Tuple[Image.Image, np.ndarray]:
        """Single-image inference (reference ``ldiffusion.py:317-324``).
        Returns (diffusion-transformed PIL image, predicted mask)."""
        if self.level == "tissue":
            return self.inference_tissue(image_path, ldiffusion_weight,
                                         segmentor_weight, num_classes)
        if self.level == "cell":
            return self.inference_cell(image_path, ldiffusion_weight,
                                       segmentor_weight, num_classes)
        raise ValueError("Invalid level specified. Choose 'tissue' or 'cell'.")

    def _transform_single(self, image_path: str, require_square: bool = True):
        from ldiffusion_tpu.segmentor.dataset_builder import DiffusionTransform

        pil = Image.open(image_path).convert("RGB")
        w, h = pil.size
        size = 1024 if not self.diffusion_path.startswith("random:") else 64
        if require_square and w != h:
            # non-square images skip the diffusion transform
            # (reference segmentor.py:449-450)
            return pil, np.asarray(pil, np.float32) / 255.0
        comps = self._components
        transform = DiffusionTransform(comps)
        img = load_image(image_path, (size, size))
        out = transform(img[None])[0]
        pil_out = Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
        return pil_out, out

    def _make_fused_predict(self, predictor):
        """One-XLA-program tissue inference for square images: 1-step
        diffusion transform → z-score → sliding-window → uint8 seg, fused in
        a single dispatch (the reference moves the image host↔GPU between
        segmentor.py:388-488's transform and predict stages; over the
        tunneled chip those transfers dominated the wall-clock, BASELINE r5).
        Returns ``run(img_norm, want_transformed)``; results are device
        arrays — dispatch is async, so callers can pipeline images and sync
        (np.asarray) later."""
        import jax
        import jax.numpy as jnp

        from ldiffusion_tpu.diffusion.pipeline import (
            one_step_transform,
            trajectory_text_emb,
        )

        comps = self._components
        emb = trajectory_text_emb(comps, comps.params, 1)
        cache = {}

        def run(img_norm: np.ndarray, want_transformed: bool):
            key = (img_norm.shape, want_transformed)
            if key not in cache:
                def f(sd_params, seg_params, im):
                    t = one_step_transform(comps, sd_params, im[None], emb)[0]
                    seg = predictor.traced_seg(seg_params, t, normalize=True)
                    return (t, seg) if want_transformed else seg

                cache[key] = jax.jit(f)
            return cache[key](comps.params, tuple(predictor.params_list),
                              jnp.asarray(img_norm))

        return run

    @staticmethod
    def _find_fold_checkpoints(segmentor_weight: str):
        """Checkpoint paths for inference: every trained ``fold_*`` dir
        contributes its best (falling back to final) checkpoint and the
        predictor fold-ensembles them by logit averaging (reference
        ``predict_from_raw_data.py:459-494``); flat layouts (no fold dirs)
        keep working."""
        from ldiffusion_tpu.segmentor.predictor import find_fold_checkpoints

        return find_fold_checkpoints(segmentor_weight)

    def inference_tissue(self, image_path, ldiffusion_weight, segmentor_weight,
                         num_classes, output_path: Optional[str] = None,
                         overwrite: bool = True):
        from ldiffusion_tpu.segmentor.planner import SegPlan
        from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

        self.log("Running inference on tissue-level model...")
        self._load_components(unet_override_dir=ldiffusion_weight)
        plan = SegPlan.load(os.path.join(segmentor_weight, "plans.json"))
        ckpts = self._find_fold_checkpoints(segmentor_weight)
        predictor = SlidingWindowPredictor.from_checkpoints(plan, ckpts)
        pp_steps = []
        for cand in ([segmentor_weight]
                     + [os.path.dirname(c) for c in ckpts]):
            pp_path = os.path.join(cand, "postprocessing.json")
            if os.path.exists(pp_path):
                from ldiffusion_tpu.segmentor.postprocess import load_postprocessing
                pp_steps = load_postprocessing(pp_path)
                break

        from ldiffusion_tpu.data.dataset import load_image

        fused = self._make_fused_predict(predictor)
        size = 1024 if not self.diffusion_path.startswith("random:") else 64

        def finish(mask) -> np.ndarray:
            mask = np.asarray(mask)  # device sync for fused results
            if pp_steps:
                from ldiffusion_tpu.segmentor.postprocess import apply_postprocessing
                mask = apply_postprocessing(mask, pp_steps)
            return mask

        if os.path.isdir(image_path):
            # batch mode (reference segmentor.py:399-419). Square images go
            # through the fused single-dispatch path; dispatch is async, so
            # up to 3 images are in flight while earlier masks postprocess
            # and write on the host.
            if not output_path:
                raise ValueError("When image_path is a folder, output_path must"
                                 " be specified!")
            os.makedirs(output_path, exist_ok=True)
            pending = []  # (out_png, device-or-host mask)
            for fn in sorted(os.listdir(image_path)):
                out_png = os.path.join(output_path, os.path.splitext(fn)[0] + ".png")
                if not overwrite and os.path.exists(out_png):
                    # --continue_prediction semantics (reference
                    # predict_from_raw_data.py:187-198): skip existing outputs
                    continue
                path = os.path.join(image_path, fn)
                with Image.open(path) as probe:
                    w, h = probe.size
                if w == h:
                    mask = fused(load_image(path, (size, size)),
                                 want_transformed=False)
                else:
                    # non-square skips the diffusion transform
                    # (reference segmentor.py:449-450)
                    _, arr = self._transform_single(path)
                    mask = predictor.predict(arr.astype(np.float32))
                pending.append((out_png, mask))
                if len(pending) >= 3:
                    png, m = pending.pop(0)
                    Image.fromarray(finish(m)).save(png)
            for png, m in pending:
                Image.fromarray(finish(m)).save(png)
            return None, None

        with Image.open(image_path) as probe:
            w, h = probe.size
        if w == h:
            t, mask = fused(load_image(image_path, (size, size)),
                            want_transformed=True)
            decoded = Image.fromarray(
                (np.clip(np.asarray(t), 0, 1) * 255).astype(np.uint8))
        else:
            decoded, arr = self._transform_single(image_path)
            mask = predictor.predict(arr.astype(np.float32))
        return decoded, finish(mask)

    def inference_cell(self, image_path, ldiffusion_weight, segmentor_weight,
                       num_classes):
        from ldiffusion_tpu.cell.classifier import CellSegClassifier

        self.log("Running inference on cell-level model...")
        self._load_components(unet_override_dir=ldiffusion_weight)
        model = CellSegClassifier(num_classes)
        ckpt = segmentor_weight
        if os.path.isdir(ckpt):
            ckpt = os.path.join(ckpt, "cellclassifier.pkl")
        model.load(ckpt)
        pil = Image.open(image_path).convert("RGB")
        w, h = pil.size
        decoded, arr = self._transform_single(image_path, require_square=False)
        mask = model.predict_mask(arr.astype(np.float32))
        mask = np.asarray(Image.fromarray(mask).resize((w, h), Image.NEAREST))
        decoded = decoded.resize((w, h), Image.BILINEAR)
        return decoded, mask


def main(argv=None):
    args = parse_args(argv)
    if int(os.environ.get("RANK", "0")) == 0:
        print("\033[35m" + str(vars(args)) + "\033[0m")
    model = LDiffusionModel(args.diffusion_path, level=args.level,
                            local_rank=args.local_rank)
    model.train(args, component=args.component)


if __name__ == "__main__":
    main()
