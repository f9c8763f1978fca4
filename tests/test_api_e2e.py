"""End-to-end API test: the full two-stage pipeline (warm-up → segmentor →
inference) on tiny synthetic PUMA-convention data with random:tiny SD
components. This is the CPU analog of the reference's full
``LDiffusionModel.train(component='all')`` + ``.inference`` flow."""
import os

import numpy as np
import pytest
from PIL import Image

from ldiffusion_tpu.api import LDiffusionModel
from ldiffusion_tpu.core.config import DiffusionTrainConfig, MeshConfig, SegmentorTrainConfig
from ldiffusion_tpu.core.dist import make_mesh


class Args:
    def __init__(self, image_dir, label_dir):
        self.image_dir = image_dir
        self.label_dir = label_dir
        self.num_epochs = 11          # 10 warm-up (overridden to 1) + 1 seg
        self.batch_size = 2
        self.num_inference_steps = 5
        self.num_classes = 7


@pytest.fixture(scope="module")
def puma_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("puma")
    img_dir, lbl_dir = root / "images", root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"roi_{i}.png")
        lab = np.zeros((64, 64), np.uint8)
        lab[:32] = 100   # class 1 pixel value
        lab[:, :16] = 150  # class 2
        Image.fromarray(lab).save(lbl_dir / f"roi_{i}.png")
    return str(img_dir), str(lbl_dir)


@pytest.mark.slow
def test_full_pipeline_tissue(puma_dirs, tmp_path):
    image_dir, label_dir = puma_dirs
    import jax

    # clean 2-device mesh (batch 2 shards evenly; a dead mesh axis triggered
    # flaky XLA-CPU aborts in the 8-device config)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    model = LDiffusionModel(
        "random:tiny", level="tissue", mesh=mesh,
        work_dir=str(tmp_path / "work"),
        diffusion_config=DiffusionTrainConfig(num_epochs=1, batch_size=2,
                                              num_inference_steps=5),
        segmentor_config=SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2,
                                              val_iters_per_epoch=1,
                                              compute_dtype="float32"),
    )
    args = Args(image_dir, label_dir)
    out = model.train(args, component="all")
    assert os.path.isdir(out["ldiffusion"])
    assert os.path.exists(os.path.join(out["ldiffusion"], "unet_params.npz"))
    seg_dir = out["segmentor"]
    assert os.path.exists(os.path.join(seg_dir, "plans.json"))
    # nnUNet-style CV layout: fold_0/ holds the checkpoints, the seeded
    # 5-fold split is persisted next to the plans (do_split analog)
    assert os.path.exists(os.path.join(seg_dir, "splits_final.json"))
    assert os.path.exists(os.path.join(seg_dir, "fold_0", "checkpoint_final.pkl"))

    # inference on one image
    img_path = os.path.join(image_dir, sorted(os.listdir(image_dir))[0])
    decoded, mask = model.inference(img_path, out["ldiffusion"], seg_dir,
                                    num_classes=7)
    assert mask.shape == (64, 64)
    assert mask.max() < 7
    assert decoded.size == (64, 64)


@pytest.mark.slow
def test_cli_parse_and_signature():
    from ldiffusion_tpu.api import parse_args

    args = parse_args([
        "--diffusion-path", "x", "--image-dir", "a", "--label-dir", "b",
        "--num-epochs", "20", "--batch-size", "2", "--num-inference-steps", "25",
        "--num-classes", "7",
    ])
    assert args.num_epochs == 20
    assert args.level == "tissue"


@pytest.mark.slow
def test_full_pipeline_cell(puma_dirs, tmp_path):
    """Cell-level two-stage pipeline: warm-up → instance+classifier training
    → inference (reference segmentor.py:243-299, 490-545)."""
    image_dir, label_dir = puma_dirs
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.core.config import MeshConfig
    import jax

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    model = LDiffusionModel(
        "random:tiny", level="cell", mesh=mesh,
        work_dir=str(tmp_path / "work"),
        diffusion_config=DiffusionTrainConfig(num_epochs=1, batch_size=2,
                                              num_inference_steps=5),
    )
    args = Args(image_dir, label_dir)
    args.num_classes = 11
    args.num_epochs = 11  # 1 cell epoch after the warm-up subtraction
    out = model.train(args, component="all")
    assert os.path.exists(out["segmentor"])

    img_path = os.path.join(image_dir, sorted(os.listdir(image_dir))[0])
    decoded, mask = model.inference(img_path, out["ldiffusion"],
                                    out["segmentor"], num_classes=11)
    assert mask.shape == (64, 64)
    assert mask.max() < 11
