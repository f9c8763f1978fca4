"""Tests for the component-parity batch: conductor nets, utils, postprocess,
label manager, model sharing, pretrained transfer, normalization, variants."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cbam_aspp_tissuesegnet():
    from ldiffusion_tpu.models.conductor import TissueSegNet, TissueSegNetConfig

    net = TissueSegNet(TissueSegNetConfig.tiny(num_classes=5))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.key(0), x)
    out = net.apply(vars_, x)
    assert out["out"].shape == (1, 64, 64, 5)


def test_depth_heatmap_net():
    from ldiffusion_tpu.models.conductor import TissueSegWithDepthHeatmap

    net = TissueSegWithDepthHeatmap(num_classes=4, backbone_dims=(8, 16, 32, 32),
                                    backbone_depths=(1, 1, 1, 1))
    rgb = jnp.zeros((1, 64, 64, 3))
    depth = jnp.zeros((1, 64, 64, 1))
    vars_ = net.init(jax.random.key(0), rgb, depth)
    out = net.apply(vars_, rgb, depth)
    assert out["seg"].shape == (1, 64, 64, 4)
    assert out["heatmap"].shape == (1, 64, 64, 4)


def test_heatmaps_and_topk():
    from ldiffusion_tpu.utils import extract_topk_points, generate_multi_class_heatmaps

    masks = np.zeros((1, 32, 32), np.int64)
    masks[0, 5:10, 5:10] = 1
    masks[0, 20:26, 20:26] = 2
    hm = generate_multi_class_heatmaps(masks, num_classes=3, sigma=2)
    assert hm.shape == (1, 3, 32, 32)
    assert hm[0, 1, 7, 7] > 0.8  # peak near blob center
    coords, labels = extract_topk_points(hm, k=3)
    assert len(coords) == 1
    assert set(np.unique(labels[0])) <= {1, 2}
    # all-below-threshold → empty
    c2, l2 = extract_topk_points(np.zeros((1, 3, 8, 8), np.float32), k=2)
    assert c2[0].shape == (0, 2)


def test_utils_micro_dice_and_iou():
    from ldiffusion_tpu.utils import mean_iou_and_per_class, micro_dice

    pred = np.zeros((1, 4, 4), np.int64)
    true = np.zeros((1, 4, 4), np.int64)
    scores, mean = micro_dice(pred, true, 3)
    assert mean == 1.0
    miou, d = mean_iou_and_per_class(pred, true, 3)
    assert miou == 1.0 and d[1] is None


def test_remove_all_but_largest_component():
    from ldiffusion_tpu.segmentor.postprocess import remove_all_but_largest_component

    seg = np.zeros((10, 10), np.uint8)
    seg[0:5, 0:5] = 1          # big component
    seg[8:10, 8:10] = 1        # small component
    out = remove_all_but_largest_component(seg, 1)
    assert out[1, 1] == 1 and out[9, 9] == 0


def test_determine_and_apply_postprocessing(tmp_path):
    from ldiffusion_tpu.segmentor.postprocess import (
        apply_postprocessing,
        determine_postprocessing,
        load_postprocessing,
        save_postprocessing,
    )

    gt = np.zeros((20, 20), np.uint8)
    gt[2:12, 2:12] = 1
    pred = gt.copy()
    pred[17:19, 17:19] = 1  # spurious island → removing it helps
    steps = determine_postprocessing([pred], [gt], num_classes=2)
    assert len(steps) >= 1
    fixed = apply_postprocessing(pred.copy(), steps)
    assert fixed[18, 18] == 0 and fixed[5, 5] == 1
    save_postprocessing(steps, str(tmp_path / "pp.json"))
    assert load_postprocessing(str(tmp_path / "pp.json")) == steps


def test_label_manager_plain_and_ignore():
    from ldiffusion_tpu.segmentor.label_manager import LabelManager

    lm = LabelManager({"background": 0, "a": 1, "b": 2, "ignore": 3})
    assert not lm.has_regions and lm.has_ignore_label and lm.ignore_label == 3
    assert lm.num_segmentation_heads == 3
    logits = np.zeros((2, 2, 3))
    logits[..., 1] = 5.0
    seg = lm.convert_logits_to_segmentation(logits)
    assert (seg == 1).all()
    tgt, mask = lm.seg_to_training_target(np.array([[0, 3], [1, 2]]))
    assert mask[0, 1] == 0 and mask[0, 0] == 1
    assert tgt[0, 1] == 0  # ignore remapped for CE safety


def test_label_manager_regions():
    from ldiffusion_tpu.segmentor.label_manager import LabelManager

    lm = LabelManager({"background": 0, "whole": (1, 2), "core": (2,)},
                      regions_class_order=(1, 2))
    assert lm.has_regions and lm.num_segmentation_heads == 2
    probs = np.zeros((2, 2, 2))
    probs[0, 0] = [0.9, 0.1]   # whole only → class 1
    probs[1, 1] = [0.9, 0.9]   # whole+core → class 2 (painted later)
    seg = lm.convert_probabilities_to_segmentation(probs)
    assert seg[0, 0] == 1 and seg[1, 1] == 2 and seg[0, 1] == 0
    tgt, _ = lm.seg_to_training_target(np.array([[0, 1], [2, 2]]))
    assert tgt.shape == (2, 2, 2)
    assert tgt[1, 0, 0] == 1 and tgt[1, 0, 1] == 1  # label 2 in both regions


def test_model_sharing_roundtrip(tmp_path):
    from ldiffusion_tpu.segmentor.model_sharing import export_model, import_model

    src = tmp_path / "model"
    src.mkdir()
    (src / "plans.json").write_text("{}")
    (src / "checkpoint_best.pkl").write_bytes(b"x")
    z = export_model(str(src), str(tmp_path / "model.zip"))
    dst = import_model(z, str(tmp_path / "imported"))
    assert os.path.exists(os.path.join(dst, "plans.json"))
    assert os.path.exists(os.path.join(dst, "checkpoint_best.pkl"))


def test_model_download_from_file_url(tmp_path):
    """download_and_install_from_url over a file:// URL (the offline route —
    reference ``model_sharing/model_download.py:11-34``); the temp download
    file must be cleaned up afterwards."""
    from ldiffusion_tpu.segmentor.model_sharing import (
        download_and_install_from_url,
        export_model,
    )

    src = tmp_path / "model"
    src.mkdir()
    (src / "plans.json").write_text("{}")
    (src / "checkpoint_best.pkl").write_bytes(b"x")
    z = export_model(str(src), str(tmp_path / "model.zip"))
    before = set(os.listdir(os.path.expanduser("~")))
    dst = download_and_install_from_url(
        "file://" + os.path.abspath(z), str(tmp_path / "installed"))
    assert os.path.exists(os.path.join(dst, "plans.json"))
    leftovers = [f for f in os.listdir(os.path.expanduser("~"))
                 if f.startswith(".lddownload_") and f not in before]
    assert not leftovers


def test_model_download_bad_zip_cleans_temp(tmp_path):
    from ldiffusion_tpu.segmentor.model_sharing import (
        download_and_install_from_url,
    )

    bad = tmp_path / "notazip.bin"
    bad.write_bytes(b"garbage")
    import zipfile

    import pytest

    before = set(os.listdir(os.path.expanduser("~")))
    with pytest.raises(zipfile.BadZipFile):
        download_and_install_from_url("file://" + os.path.abspath(bad),
                                      str(tmp_path / "installed"))
    leftovers = [f for f in os.listdir(os.path.expanduser("~"))
                 if f.startswith(".lddownload_") and f not in before]
    assert not leftovers


def test_pretrained_transfer():
    from ldiffusion_tpu.segmentor.pretrained import transfer_pretrained_weights

    src = {"a": {"kernel": np.ones((3, 3)), "bias": np.ones((3,))},
           "head": {"kernel": np.ones((3, 7))}}
    tgt = {"a": {"kernel": np.zeros((3, 3)), "bias": np.zeros((3,))},
           "head": {"kernel": np.zeros((3, 5))}}  # class-count mismatch
    new, transferred, skipped = transfer_pretrained_weights(tgt, src, verbose=False)
    assert "a/kernel" in transferred and "head/kernel" in skipped
    assert np.asarray(new["a"]["kernel"]).sum() == 9
    assert np.asarray(new["head"]["kernel"]).sum() == 0


def test_normalization_schemes():
    from ldiffusion_tpu.segmentor.preprocess import normalize

    img = np.random.default_rng(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
    z = normalize(img, "zscore_image")
    assert abs(z.mean()) < 1e-4
    r = normalize(img, "rescale_to_01")
    assert r.min() == 0 and r.max() == pytest.approx(1.0)
    rgb = normalize(img, "rgb_to_01")
    assert rgb.max() <= 1.0
    props = {str(c): {"percentile_00_5": 10, "percentile_99_5": 240,
                      "mean": 100, "std": 50} for c in range(3)}
    ct = normalize(img, "ct", props)
    assert np.isfinite(ct).all()
    nn_ = normalize(img, "none")
    np.testing.assert_allclose(nn_, img)


def test_trainer_variants():
    from ldiffusion_tpu.segmentor.variants import get_variant, lr_at_epoch

    v = get_variant("nnUNetTrainer_5epochs")
    assert v.config.num_epochs == 5
    v = get_variant("nnUNetTrainerNoDA")
    assert v.augment.p_rotation == 0 and v.augment.p_mirror == 0
    v = get_variant("nnUNetTrainerDiceLoss")
    assert v.loss == "dice"
    v = get_variant("nnUNetTrainerCosAnneal")
    assert v.lr_schedule == "cosine"
    assert lr_at_epoch(v, 0, 10) == pytest.approx(v.config.initial_lr)
    assert lr_at_epoch(v, 10, 10) == pytest.approx(0.0, abs=1e-9)
    v = get_variant("nnUNetTrainer_8000epochs")
    assert v.config.num_epochs == 8000


def test_resnet_encoder_and_converter_shapes():
    import torch

    from ldiffusion_tpu.models.resnet import (
        ResNetConfig,
        ResNetEncoder,
        convert_resnet,
    )

    # tiny torch-style state dict exercising the converter layout rules
    cfg = ResNetConfig(stage_sizes=(1,), width=4)
    enc = ResNetEncoder(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = enc.init(jax.random.key(0), x)
    out = enc.apply(vars_, x)
    assert out.shape[-1] == 16  # width*4 bottleneck

    sd = {
        "conv1.weight": np.zeros((4, 3, 7, 7), np.float32),
        "bn1.weight": np.ones(4, np.float32), "bn1.bias": np.zeros(4, np.float32),
        "bn1.running_mean": np.zeros(4, np.float32),
        "bn1.running_var": np.ones(4, np.float32),
        "layer1.0.conv1.weight": np.zeros((4, 4, 1, 1), np.float32),
        "layer1.0.bn1.weight": np.ones(4, np.float32),
        "layer1.0.bn1.bias": np.zeros(4, np.float32),
        "layer1.0.bn1.running_mean": np.zeros(4, np.float32),
        "layer1.0.bn1.running_var": np.ones(4, np.float32),
        "layer1.0.conv2.weight": np.zeros((4, 4, 3, 3), np.float32),
        "layer1.0.bn2.weight": np.ones(4, np.float32),
        "layer1.0.bn2.bias": np.zeros(4, np.float32),
        "layer1.0.bn2.running_mean": np.zeros(4, np.float32),
        "layer1.0.bn2.running_var": np.ones(4, np.float32),
        "layer1.0.conv3.weight": np.zeros((16, 4, 1, 1), np.float32),
        "layer1.0.bn3.weight": np.ones(16, np.float32),
        "layer1.0.bn3.bias": np.zeros(16, np.float32),
        "layer1.0.bn3.running_mean": np.zeros(16, np.float32),
        "layer1.0.bn3.running_var": np.ones(16, np.float32),
        "layer1.0.downsample.0.weight": np.zeros((16, 4, 1, 1), np.float32),
        "layer1.0.downsample.1.weight": np.ones(16, np.float32),
        "layer1.0.downsample.1.bias": np.zeros(16, np.float32),
        "layer1.0.downsample.1.running_mean": np.zeros(16, np.float32),
        "layer1.0.downsample.1.running_var": np.ones(16, np.float32),
    }
    converted = convert_resnet(sd, cfg)
    # converted tree must slot into the flax structure
    assert converted["params"]["conv1"]["kernel"].shape == (7, 7, 3, 4)
    assert converted["params"]["layer1_0"]["conv3"]["kernel"].shape == (1, 1, 4, 16)
    assert converted["batch_stats"]["layer1_0"]["bn3"]["var"].shape == (16,)


def test_sample_tool(tmp_path):
    from ldiffusion_tpu.diffusion.pipeline import SDComponents
    from ldiffusion_tpu.tools.sample import sample_steps

    comps = SDComponents.random(image_size=64)
    img = np.zeros((64, 64, 3), np.float32)
    paths = sample_steps(comps, img, num_steps=2, out_dir=str(tmp_path))
    assert len(paths) == 3  # PLMS: n+1 visits for n=2
    assert all(os.path.exists(p) for p in paths)
