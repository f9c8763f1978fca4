"""Regression tests for the round-3 self-review findings: regions/ignore-
aware best-configuration, topk ignore masking, onlyMirror01 2D semantics,
shared fold-checkpoint discovery, CV coverage length check.
"""
import numpy as np
import pytest


def test_find_best_configuration_regions_and_ignore():
    """Regions regime: probabilities must paint through regions_class_order
    (argmax over sigmoid heads would be wrong) and ignore-label GT pixels
    must not crash or skew the scoring."""
    from ldiffusion_tpu.segmentor.best_config import find_best_configuration
    from ldiffusion_tpu.segmentor.label_manager import LabelManager

    lm = LabelManager({"background": 0, "whole": (1, 2), "core": (2,),
                       "ignore": 3}, regions_class_order=(1, 2))
    # GT: label 1 ring with label 2 core, plus an ignore strip (value 3 —
    # BIGGER than the 2 network heads: the old CM path would crash here)
    gt = np.zeros((16, 16), np.uint8)
    gt[4:12, 4:12] = 1
    gt[6:10, 6:10] = 2
    gt[:2] = 3
    # config A: sigmoid probs matching the GT regions; config B: all
    # background → A must win
    pa = np.zeros((16, 16, 2), np.float32)
    pa[..., 0] = (gt == 1) | (gt == 2)
    pa[..., 1] = gt == 2
    pb = np.zeros((16, 16, 2), np.float32)
    info = find_best_configuration({"good": [pa], "bad": [pb]}, [gt],
                                   num_classes=2, label_manager=lm)
    assert info["best_configuration"] == "good"
    assert info["all_results"]["good"] > 0.9
    assert info["all_results"]["bad"] < 0.1


def test_find_best_configuration_rejects_mismatched_case_counts():
    from ldiffusion_tpu.segmentor.best_config import find_best_configuration

    gts = [np.zeros((8, 8), np.uint8)] * 2
    probs_ok = [np.zeros((8, 8, 2), np.float32)] * 2
    probs_short = [np.zeros((8, 8, 2), np.float32)]  # one case missing
    with pytest.raises(AssertionError):
        find_best_configuration({"a": probs_ok, "b": probs_short}, gts,
                                num_classes=2)


def test_topk_masks_ignore_before_selection():
    """High-loss ignore pixels must NOT flood the hardest-k% set."""
    import jax.numpy as jnp

    from ldiffusion_tpu.losses.dice import topk_cross_entropy

    logits = np.zeros((1, 10, 10, 2), np.float32)
    logits[..., 0] = 10.0          # confidently background everywhere
    tgt = np.zeros((1, 10, 10), np.int32)
    tgt[0, :5] = 1                 # half the pixels "ignore-ish": wrong class
    mask = np.ones((1, 10, 10), np.float32)
    mask[0, :5] = 0.0              # ...but masked out
    unmasked = float(topk_cross_entropy(jnp.asarray(logits), jnp.asarray(tgt)))
    masked = float(topk_cross_entropy(jnp.asarray(logits), jnp.asarray(tgt),
                                      loss_mask=jnp.asarray(mask)))
    assert unmasked > 5.0          # top-10% dominated by the wrong-class rows
    assert masked < 1.0            # masked: only easy pixels remain


def test_only_mirror01_2d_restricts_to_axis0(tmp_path):
    """In 2D, onlyMirror01 mirrors axis 0 ONLY (reference dim branch)."""
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer
    from ldiffusion_tpu.segmentor.variants import get_variant

    plan = SegPlan(patch_size=(16, 16), batch_size=2,
                   features_per_stage=(4, 8), strides=(1, 2),
                   n_conv_per_stage=1, num_classes=2, in_channels=1,
                   normalization="zscore_image", intensity_properties={},
                   median_shape=(16, 16), batch_dice=True,
                   deep_supervision=False)
    base = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1,
                                val_iters_per_epoch=1, compute_dtype="float32")
    variant = get_variant("nnUNetTrainer_onlyMirror01", base=base)
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                     devices=jax.devices()[:1])
    tr = SegmentorTrainer(plan, variant.config, mesh,
                          output_dir=str(tmp_path), variant=variant)
    assert tr.augment_cfg.mirror_axes == (0,)


def test_fold_checkpoint_discovery_shared(tmp_path):
    from ldiffusion_tpu.segmentor.predictor import find_fold_checkpoints

    cfg = tmp_path / "cfg"
    (cfg / "fold_0").mkdir(parents=True)
    (cfg / "fold_1").mkdir()
    (cfg / "fold_0" / "checkpoint_best.pkl").write_bytes(b"x")
    (cfg / "fold_1" / "checkpoint_final.pkl").write_bytes(b"x")
    cks = find_fold_checkpoints(str(cfg))
    assert [c.split("/")[-1] for c in cks] == ["checkpoint_best.pkl",
                                               "checkpoint_final.pkl"]
    assert len(find_fold_checkpoints(str(cfg), folds=[1])) == 1
    # flat layout fallback
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "checkpoint_final.pkl").write_bytes(b"x")
    assert len(find_fold_checkpoints(str(flat))) == 1
    with pytest.raises(FileNotFoundError):
        find_fold_checkpoints(str(tmp_path / "empty_missing"))


def test_cli_ensemble_paints_regions(tmp_path):
    """ensemble -d on a regions dataset paints through regions_class_order."""
    from ldiffusion_tpu.data.converters import generate_integration_test_dataset
    from ldiffusion_tpu.segmentor.cli import main

    raw = tmp_path / "raw"
    raw.mkdir()
    generate_integration_test_dataset(str(raw / "Dataset009_Test"), n_cases=2,
                                      size=32, num_classes=3, regime="regions")
    a = tmp_path / "a"
    a.mkdir()
    # sigmoid region probs: head 0 ("whole") hot everywhere, head 1 ("core")
    # hot in a corner → painted labels 1 with a 2-corner
    p = np.zeros((16, 16, 2), np.float16)
    p[..., 0] = 0.9
    p[:4, :4, 1] = 0.9
    np.savez_compressed(a / "case_000.npz", probabilities=p)
    out = str(tmp_path / "ens")
    main(["ensemble", "-i", str(a), "-o", out, "-d", "9", "--raw", str(raw)])
    from PIL import Image
    seg = np.asarray(Image.open(f"{out}/case_000.png"))
    assert (seg[:4, :4] == 2).all()
    assert (seg[8:, 8:] == 1).all()
