"""Sliding-window prediction with gaussian blending and mirror TTA.

Behavioral contract: ``nnUNetPredictor`` internals (reference
``inference/predict_from_raw_data.py:496-634``, ``sliding_window_prediction.py``):
pad to ≥patch, tile with step 0.5×patch (evenly distributed starts), weight
each tile's logits by a centered gaussian (σ = patch/8, floored at its
minimum nonzero value), optional test-time mirroring over all axis
combinations, fold ensembling by logit averaging, then argmax + un-pad.

TPU-first: the reference iterates tiles in Python with CUDA sync per tile;
here the tile loop is a ``lax.scan`` inside one jitted function — extraction
is ``dynamic_slice``, accumulation ``dynamic_update_slice`` on an HBM
accumulator, so the whole image predicts in a single XLA program. Tile
positions are static per (image-shape, patch) pair: images bucket to a small
number of compiled programs.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldiffusion_tpu.models.dynunet import DynUNet
from ldiffusion_tpu.segmentor.planner import SegPlan
from ldiffusion_tpu.segmentor.preprocess import zscore_normalize


def _spatial_normalize(image: np.ndarray, nd: int) -> np.ndarray:
    """Per-channel z-score over all spatial axes (2D or 3D)."""
    axes = tuple(range(nd))
    mean = image.mean(axis=axes, keepdims=True)
    std = image.std(axis=axes, keepdims=True)
    return ((image - mean) / np.maximum(std, 1e-8)).astype(np.float32)


def compute_steps(image_size: int, patch_size: int, step_frac: float = 0.5) -> List[int]:
    """Evenly-distributed tile starts (reference
    ``predict_from_raw_data.py:496-528`` / compute_steps_for_sliding_window)."""
    if image_size <= patch_size:
        return [0]
    target_step = patch_size * step_frac
    num_steps = int(np.ceil((image_size - patch_size) / target_step)) + 1
    max_start = image_size - patch_size
    if num_steps > 1:
        actual = max_start / (num_steps - 1)
    else:
        actual = 0
    return [int(round(i * actual)) for i in range(num_steps)]


def gaussian_importance_map(patch: Tuple[int, int], sigma_scale: float = 1.0 / 8) -> np.ndarray:
    """Centered gaussian weight map (reference
    ``sliding_window_prediction.py:10-29``)."""
    tmp = np.zeros(patch, np.float32)
    center = [p // 2 for p in patch]
    tmp[tuple(center)] = 1.0
    from scipy.ndimage import gaussian_filter

    sigmas = [p * sigma_scale for p in patch]
    g = gaussian_filter(tmp, sigmas, mode="constant")
    g = g / g.max()
    g[g == 0] = g[g > 0].min()  # floor at min nonzero (reference behavior)
    return g.astype(np.float32)


def find_fold_checkpoints(config_dir: str, folds=None,
                          checkpoint_name: str = None) -> List[str]:
    """Best (falling back to final) checkpoint per ``fold_*`` dir — the one
    shared implementation of per-fold checkpoint discovery (reference loads
    ``checkpoint_best.pth`` per fold, ``predict_from_raw_data.py:78-125``).
    ``folds=None`` takes every fold dir present; a flat layout (no fold
    dirs) is searched directly. ``checkpoint_name`` (the -chk flag) forces
    one exact file name. Raises when nothing is found."""
    import glob as _glob
    import os as _os

    if folds is None:
        dirs = sorted(d for d in _glob.glob(_os.path.join(config_dir, "fold_*"))
                      if _os.path.isdir(d)) or [config_dir]
    else:
        dirs = [_os.path.join(config_dir, f"fold_{f}") for f in folds]
    # -chk forces one exact checkpoint name (reference nnUNetv2_predict
    # -chk, default checkpoint_final.pth there); default keeps this repo's
    # best-falling-back-to-final preference
    names = (checkpoint_name,) if checkpoint_name else \
        ("checkpoint_best.pkl", "checkpoint_final.pkl")
    ckpts = []
    for d in dirs:
        for name in names:
            p = _os.path.join(d, name)
            if _os.path.exists(p):
                ckpts.append(p)
                break
        else:
            if folds is not None:
                print(f"WARNING: no checkpoint in {d} — fold skipped "
                      f"(ensembling over the trained folds only)")
    if not ckpts:
        raise FileNotFoundError(
            f"no {checkpoint_name or 'checkpoint_best/final.pkl'} under "
            f"{config_dir} (folds={folds if folds is not None else 'all'})")
    return ckpts


class SlidingWindowPredictor:
    def __init__(self, plan, params, use_gaussian: bool = True,
                 use_mirroring: bool = True, dtype=jnp.bfloat16,
                 label_manager=None, mirror_axes=None,
                 tile_step_size: float = 0.5):
        """plan: SegPlan (2D) or SegPlan3D — the same scan-tiled program
        drives both (the 3D analog of the reference's
        ``data_loader_3d``-fed predictor).

        mirror_axes: spatial axes (0-indexed) eligible for test-time
        mirroring; ``None`` allows all. Matches the reference's
        ``inference_allowed_mirroring_axes`` restriction (models trained by
        NoMirroring/onlyMirror01 variants must not see flips they never
        trained with — ``predict_from_raw_data.py:530-545``).

        label_manager: a ``segmentor.label_manager.LabelManager``; when given,
        ``predict`` routes through its inference nonlinearity + segmentation
        conversion (sigmoid + regions_class_order painting for the regions
        regime; softmax + label-value mapping otherwise) instead of raw
        argmax — reference ``predict_from_raw_data.py:459-494`` →
        ``export_prediction.py:15-106`` → ``label_handling.py:128-176``."""
        self.plan = plan
        self.label_manager = label_manager
        self.nd = len(plan.patch_size)
        if self.nd == 3:
            from ldiffusion_tpu.models.dynunet3d import DynUNet3D

            self.net = DynUNet3D(plan.network_config(), dtype=dtype)
        else:
            self.net = DynUNet(plan.network_config(), dtype=dtype)
        # each entry is either a raw param tree or a variables dict
        # {"params": ..., "batch_stats": ...} (BN nets — nnUNetTrainerBN)
        self.params_list = params if isinstance(params, (list, tuple)) else [params]
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        # allowed TTA flip axes as ARRAY axes (spatial axis a -> a+1 past the
        # batch dim); None -> every spatial axis
        allowed = range(self.nd) if mirror_axes is None else mirror_axes
        self.mirror_array_axes = tuple(sorted(
            a + 1 for a in allowed if 0 <= a < self.nd))
        # sliding-window overlap (reference -step_size, default 0.5)
        assert 0 < tile_step_size <= 1, tile_step_size
        self.tile_step_size = float(tile_step_size)
        self._predict_cache = {}

    @classmethod
    def from_checkpoints(cls, plan: SegPlan, paths: Sequence[str], **kw):
        """Fold ensembling: load several checkpoints, logits are averaged
        (reference ``predict_from_raw_data.py:459-494``)."""
        from ldiffusion_tpu.core.checkpoint import load_pytree

        params = []
        for p in paths:
            ck = load_pytree(p)
            if ck.get("batch_stats"):  # BN net: running stats ride along
                params.append({"params": ck["params"],
                               "batch_stats": ck["batch_stats"]})
            else:
                params.append(ck["params"])
        return cls(plan, params, **kw)

    # -- jitted core --------------------------------------------------------
    def _tile_fn(self, params, tile):
        """(1, *patch, C) -> (1, *patch, num_classes) with optional mirror TTA
        (reference ``:530-545``: average over ALL spatial flip combinations —
        4 in 2D, 8 in 3D)."""
        import itertools

        variables = params if (isinstance(params, dict) and "params" in params) \
            else {"params": params}

        def fwd(x):
            return self.net.apply(variables, x, train=False)

        logits = fwd(tile)
        if self.use_mirroring and self.mirror_array_axes:
            ax = self.mirror_array_axes
            combos = [c for r in range(1, len(ax) + 1)
                      for c in itertools.combinations(ax, r)]
            for axes in combos:
                logits = logits + jnp.flip(fwd(jnp.flip(tile, axes)), axes)
            logits = logits / (len(combos) + 1.0)
        return logits

    def _device_seg(self, logits):
        """Traced logits → uint8 segmentation ON DEVICE (reference
        ``label_handling.py:128-176`` semantics). Keeping this inside the
        jitted program means only spatial×uint8 bytes cross the
        device→host link instead of spatial×classes×f32 — on the tunneled
        chip that transfer dominated the whole predict stage (BASELINE r5)."""
        lm = self.label_manager
        if lm is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        if lm.has_regions:
            # sigmoid(x) > 0.5 ⇔ x > 0: paint in regions_class_order
            seg = jnp.zeros(logits.shape[:-1], jnp.uint8)
            for i, cls in enumerate(lm.regions_class_order):
                seg = jnp.where(logits[..., i] > 0, jnp.uint8(cls), seg)
            return seg
        # softmax is monotonic per-pixel: argmax of logits == argmax of probs
        labels = jnp.asarray(sorted(lm._plain), jnp.uint8)
        return labels[jnp.argmax(logits, axis=-1)]

    def _traced_ensembled(self, params_list, image, positions: np.ndarray):
        """TRACED: padded/normalized (*spatial, C) image → fold-averaged
        blended logits. Ensembling averages logits ON DEVICE in the same
        dispatch (reference ``predict_from_raw_data.py:459-494`` averaged
        on host per fold)."""
        patch = tuple(self.plan.patch_size)
        c = self.plan.num_classes
        padded_shape = tuple(image.shape[: self.nd])
        gauss = jnp.asarray(
            gaussian_importance_map(patch) if self.use_gaussian
            else np.ones(patch, np.float32)
        )
        pos = jnp.asarray(np.asarray(positions, np.int32))  # (T, nd)

        def blended(params):
            acc = jnp.zeros(padded_shape + (c,), jnp.float32)
            wacc = jnp.zeros(padded_shape + (1,), jnp.float32)

            def body(carry, p):
                acc, wacc = carry
                start = tuple(p[i] for i in range(len(patch))) + (0,)
                tile = jax.lax.dynamic_slice(image, start,
                                             patch + (image.shape[-1],))
                logits = self._tile_fn(params, tile[None])[0].astype(jnp.float32)
                logits = logits * gauss[..., None]
                cur = jax.lax.dynamic_slice(acc, start, patch + (c,))
                acc = jax.lax.dynamic_update_slice(acc, cur + logits, start)
                curw = jax.lax.dynamic_slice(wacc, start, patch + (1,))
                wacc = jax.lax.dynamic_update_slice(
                    wacc, curw + gauss[..., None], start)
                return (acc, wacc), None

            (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), pos)
            return acc / wacc

        out = blended(params_list[0])
        for p in params_list[1:]:
            out = out + blended(p)
        return out / len(params_list)

    def traced_seg(self, params_list, image, normalize: bool = True):
        """TRACED (jit-composable): unpadded (*spatial, C) image → uint8
        segmentation, entirely on device. Lets callers FUSE upstream device
        work (e.g. the 1-step diffusion transform) with sliding-window
        prediction in one XLA program — one upload, a uint8 download, no
        intermediate host roundtrips (the reference's pipeline moves the
        image host↔GPU between every stage, ``segmentor.py:388-488``)."""
        import itertools

        nd = self.nd
        shape = tuple(image.shape[:nd])
        if normalize:
            axes = tuple(range(nd))
            mean = image.mean(axis=axes, keepdims=True)
            std = image.std(axis=axes, keepdims=True)
            image = ((image - mean) / jnp.maximum(std, 1e-8)).astype(jnp.float32)
        else:
            image = image.astype(jnp.float32)
        patch = tuple(self.plan.patch_size)
        pads = [max(0, p - s) for p, s in zip(patch, shape)]
        if any(pads):
            image = jnp.pad(image, [(0, p) for p in pads] + [(0, 0)])
        padded = tuple(image.shape[:nd])
        steps = [compute_steps(padded[i], patch[i], self.tile_step_size)
                 for i in range(nd)]
        positions = np.array(list(itertools.product(*steps)), np.int32)
        logits = self._traced_ensembled(tuple(params_list), image, positions)
        logits = logits[tuple(slice(0, s) for s in shape)]
        return self._device_seg(logits)

    def _build_predict(self, padded_shape: Tuple[int, ...], positions: np.ndarray,
                       mode: str = "logits", crop: Tuple[int, ...] = ()):
        @jax.jit
        def predict(params_list, image):
            out = self._traced_ensembled(params_list, image, positions)
            if mode == "seg":
                out = out[tuple(slice(0, s) for s in crop)]
                return self._device_seg(out)
            return out

        return predict

    # -- public -------------------------------------------------------------
    def _run(self, image: np.ndarray, normalize: bool, mode: str):
        """Shared pad/tile/dispatch: one jitted program per (padded shape,
        tile count, mode) bucket, all folds in the single dispatch."""
        import itertools

        nd = self.nd
        if normalize:
            image = _spatial_normalize(image, nd)
        shape = image.shape[:nd]
        patch = tuple(self.plan.patch_size)
        pads = [max(0, p - s) for p, s in zip(patch, shape)]
        if any(pads):
            image = np.pad(image, [(0, p) for p in pads] + [(0, 0)])
        padded = image.shape[:nd]
        steps = [compute_steps(padded[i], patch[i], self.tile_step_size)
                 for i in range(nd)]
        positions = np.array(list(itertools.product(*steps)), np.int32)
        cache_key = (padded, len(positions), mode, shape if mode == "seg" else ())
        if cache_key not in self._predict_cache:
            self._predict_cache[cache_key] = self._build_predict(
                tuple(padded), positions, mode=mode, crop=shape)
        predict = self._predict_cache[cache_key]
        out = np.asarray(predict(tuple(self.params_list), jnp.asarray(image)))
        if mode == "seg":
            return out
        return out[tuple(slice(0, s) for s in shape)]

    def predict_logits(self, image: np.ndarray, normalize: bool = True) -> np.ndarray:
        """image: (*spatial, C) float → (*spatial, num_classes) blended
        logits (2D or 3D, by plan rank)."""
        return self._run(image, normalize, "logits")

    def predict(self, image: np.ndarray, normalize: bool = True) -> np.ndarray:
        """→ (*spatial) segmentation. With a label manager this applies the
        regime's inference nonlin + conversion (regions paint in
        regions_class_order where sigmoid > 0.5 ⇔ logit > 0; plain maps
        argmax through label VALUES); without one it is plain argmax.
        The conversion runs ON DEVICE so only uint8 crosses device→host."""
        return self._run(image, normalize, "seg")

    def predict_probabilities(self, image: np.ndarray,
                              normalize: bool = True) -> np.ndarray:
        """→ (*spatial, C) probabilities under the regime's inference nonlin
        (sigmoid for regions, softmax otherwise) — the --save_probabilities
        payload (reference ``export_prediction.py:109-121``)."""
        logits = self.predict_logits(image, normalize)
        if self.label_manager is not None:
            return self.label_manager.apply_inference_nonlin(logits)
        x = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=-1, keepdims=True)
