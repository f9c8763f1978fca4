"""Tests for: best-config finder, nnUNet summary.json, dataset converters,
IO registry, RGB-D dataset utilities, ControlNet + multimodal augment,
prefetcher."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


def test_find_best_configuration(tmp_path):
    from ldiffusion_tpu.segmentor.best_config import find_best_configuration

    rng = np.random.default_rng(0)
    gt = np.zeros((16, 16), np.uint8)
    gt[4:12, 4:12] = 1
    # config A: perfect; config B: noisy
    probs_a = np.zeros((16, 16, 2)); probs_a[..., 0] = 1
    probs_a[4:12, 4:12] = [0, 1]
    probs_b = rng.random((16, 16, 2))
    info = find_best_configuration({"a": [probs_a], "b": [probs_b]}, [gt], 2,
                                   output_json=str(tmp_path / "info.json"))
    assert info["best_configuration"] in ("a", "ensemble___a___b")
    assert os.path.exists(tmp_path / "info.json")
    assert info["score"] > 0.9


def test_compute_metrics_on_folder_summary(tmp_path):
    from ldiffusion_tpu.evaluate import compute_metrics_on_folder

    pred_dir, gt_dir = tmp_path / "p", tmp_path / "g"
    pred_dir.mkdir(); gt_dir.mkdir()
    m = np.zeros((8, 8), np.uint8); m[:4] = 1
    Image.fromarray(m).save(pred_dir / "c.png")
    Image.fromarray(m).save(gt_dir / "c.png")
    s = compute_metrics_on_folder(str(pred_dir), str(gt_dir), 3,
                                  output_file=str(tmp_path / "summary.json"))
    assert s["foreground_mean"]["Dice"] == pytest.approx(1.0)
    assert s["metric_per_case"][0]["metrics"]["1"]["Dice"] == pytest.approx(1.0)
    assert os.path.exists(tmp_path / "summary.json")


def test_converters_and_integration_dataset(tmp_path):
    from ldiffusion_tpu.data.converters import (
        convert_folder_dataset,
        generate_integration_test_dataset,
    )

    src_i, src_l = tmp_path / "i", tmp_path / "l"
    src_i.mkdir(); src_l.mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(src_i / f"x{i}.png")
        lab = np.zeros((16, 16), np.uint8); lab[:4] = 100
        Image.fromarray(lab).save(src_l / f"x{i}.png")
    out = convert_folder_dataset(str(src_i), str(src_l), str(tmp_path / "ds"),
                                 num_classes=7, level="tissue", train_ratio=0.67)
    assert os.path.exists(os.path.join(out, "dataset.json"))
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 2
    assert len(os.listdir(os.path.join(out, "imagesTs"))) == 1
    lab = np.asarray(Image.open(os.path.join(out, "labelsTr", "case_000.png")))
    assert set(np.unique(lab)) == {0, 1}  # pixel 100 → class 1

    for regime in ("plain", "ignore", "regions", "regions_ignore"):
        d = generate_integration_test_dataset(str(tmp_path / f"it_{regime}"),
                                              n_cases=3, size=32, regime=regime)
        dj = json.load(open(os.path.join(d, "dataset.json")))
        if "ignore" in regime:
            assert "ignore" in dj["labels"]
        if regime.startswith("regions"):
            assert isinstance(dj["labels"]["whole"], list)
            assert "regions_class_order" in dj


def test_io_registry(tmp_path):
    from ldiffusion_tpu.data.io import NaturalImage2DIO, determine_reader_writer

    rw = determine_reader_writer(".png")
    assert isinstance(rw, NaturalImage2DIO)
    img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "x.png")
    data, props = rw.read_images([str(tmp_path / "x.png")])
    assert data.shape == (3, 1, 8, 8)
    assert props["spacing"] == [999.0, 1.0, 1.0]
    seg = np.zeros((1, 1, 8, 8), np.uint8)
    rw.write_seg(seg, str(tmp_path / "s.png"))
    back, _ = rw.read_seg(str(tmp_path / "s.png"))
    assert back.shape == (1, 1, 8, 8)
    with pytest.raises(ValueError):
        determine_reader_writer(".xyz")


def test_canny_edges():
    from ldiffusion_tpu.data.rgbd import canny_edges, map_mask

    img = np.zeros((32, 32), np.uint8)
    img[:, 16:] = 255  # vertical step edge
    edges = canny_edges(img)
    assert edges[16, 15:17].max() == 255   # edge found at the step
    assert edges[16, :10].max() == 0       # no edges in flat region
    m = map_mask(np.array([[0, 60], [120, 255]], np.uint8))
    np.testing.assert_array_equal(m, [[0, 1], [2, 0]])


def test_controlnet_and_multimodal_augment():
    from ldiffusion_tpu.diffusion.multimodal import multimodal_augment
    from ldiffusion_tpu.diffusion.pipeline import SDComponents
    from ldiffusion_tpu.models.controlnet import ControlNet

    comps = SDComponents.random(image_size=32)
    # tiny VAE downsamples 2x -> one downsample in the conditioning embed
    cn = ControlNet(comps.unet_config, conditioning_embed_channels=(4, 8))
    lat = jnp.zeros((1, 16, 16, 4))
    cond = jnp.zeros((1, 32, 32, 3))
    ctx = jnp.zeros((1, 5, comps.unet_config.cross_attention_dim))
    cn_params = cn.init(jax.random.key(0), lat, jnp.int32(1), ctx, cond)["params"]
    down, mid = cn.apply({"params": cn_params}, lat, jnp.int32(1), ctx, cond)
    # zero-convs → all residuals start at exactly 0
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down)
    assert float(jnp.abs(mid).max()) == 0.0

    rgb = jnp.zeros((1, 32, 32, 3))
    dtm = jnp.zeros((1, 32, 32, 1))
    out = multimodal_augment(comps, cn, cn_params, rgb, dtm, jax.random.key(1))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_residual_injection():
    from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig

    cfg = UNet2DConditionConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 5, cfg.cross_attention_dim))
    params = unet.init(jax.random.key(0), x, jnp.int32(1), ctx)
    base = unet.apply(params, x, jnp.int32(1), ctx)
    # residual shapes: conv_in + per-resnet + downsample outputs
    n_res = 1 + cfg.layers_per_block * len(cfg.down_block_types) + (
        len(cfg.block_out_channels) - 1)
    down = []
    h, ch_list = 8, []
    chans = [cfg.block_out_channels[0]]
    sz = [8]
    for i, ch in enumerate(cfg.block_out_channels):
        for _ in range(cfg.layers_per_block):
            chans.append(ch); sz.append(sz[-1])
        if i < len(cfg.block_out_channels) - 1:
            chans.append(ch); sz.append(sz[-1] // 2)
    down = [jnp.ones((1, s, s, c)) for s, c in zip(sz, chans)]
    mid = jnp.ones((1, sz[-1], sz[-1], cfg.block_out_channels[-1]))
    out = unet.apply(params, x, jnp.int32(1), ctx,
                     down_block_residuals=down, mid_residual=mid)
    assert float(jnp.abs(out - base).max()) > 1e-5


def test_prefetcher():
    from ldiffusion_tpu.data.prefetch import Prefetcher

    pf = Prefetcher(iter(range(5)), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("producer died")

    pf2 = Prefetcher(boom())
    assert next(pf2) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(pf2)
        next(pf2)


def test_segmentation_overlay(tmp_path):
    """Overlay rendering (nnUNet utilities/overlay_plots.py analog)."""
    import numpy as np

    from ldiffusion_tpu.utils import save_segmentation_overlay

    img = np.zeros((8, 8, 3), np.float32) + 0.5
    seg = np.zeros((8, 8), np.int64)
    seg[2:6, 2:6] = 1
    p = str(tmp_path / "ov.png")
    save_segmentation_overlay(img, seg, p)
    from PIL import Image

    out = np.asarray(Image.open(p))
    assert out.shape == (8, 8, 3)
    assert (out[0, 0] == 127).all() or (out[0, 0] == 128).all()  # untouched bg
    assert out[3, 3, 0] > out[3, 3, 2]  # class-1 red blend
