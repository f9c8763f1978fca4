"""Dataset converters: external dataset layouts → this framework's dataset
directory format.

Behavioral contract: nnUNet's ``dataset_conversion/**`` (reference: 12
``DatasetXXX_*.py`` public-dataset converters, an MSD converter, and
integration-test dataset generators). The equivalents here:

* ``convert_folder_dataset`` — generic (images dir + labels dir) → dataset
  dir, the shape every ``DatasetXXX_*.py`` script reduces to.
* ``convert_msd_dataset`` — Medical-Segmentation-Decathlon layout
  (imagesTr/labelsTr/dataset.json) → dataset dir.
* ``convert_puma`` — the PUMA melanoma ROI layout used by L-Diffusion
  (1024² TIF images + PNG pixel-convention masks, reference README.md:40-41).
* ``generate_integration_test_dataset`` — synthetic tiny dataset (the analog
  of Dataset996-999 generators) for end-to-end tests without real data.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import numpy as np

from ldiffusion_tpu.data.labels import label_lut


def generate_dataset_json(output_folder: str,
                          channel_names: Dict,
                          labels: Dict,
                          num_training_cases: int,
                          file_ending: str,
                          regions_class_order=None,
                          dataset_name: Optional[str] = None,
                          reference: Optional[str] = None,
                          release: Optional[str] = None,
                          license: Optional[str] = None,
                          description: Optional[str] = None,
                          overwrite_image_reader_writer: Optional[str] = None,
                          **kwargs) -> Dict:
    """Public dataset.json writer (reference
    ``dataset_conversion/generate_dataset_json.py:6-103``): normalizes
    channel-name keys to strings and label values to ints/tuples, requires
    ``regions_class_order`` when any label is a multi-value region, writes
    the optional provenance fields (note the reference's ``licence``
    spelling, kept for file-format parity), and passes extra kwargs through
    verbatim."""
    has_regions = any(isinstance(v, (tuple, list)) and len(v) > 1
                      for v in labels.values())
    if has_regions and regions_class_order is None:
        raise ValueError("labels define regions but regions_class_order is "
                         "not set — region painting order is required")

    channel_names = {str(k): v for k, v in channel_names.items()}
    norm_labels = {}
    for name, value in labels.items():
        if isinstance(value, (tuple, list)):
            norm_labels[name] = [int(i) for i in value]
        else:
            norm_labels[name] = int(value)

    dataset_json = {
        "channel_names": channel_names,
        "labels": norm_labels,
        "numTraining": int(num_training_cases),
        "file_ending": file_ending,
    }
    if dataset_name is not None:
        dataset_json["name"] = dataset_name
    if reference is not None:
        dataset_json["reference"] = reference
    if release is not None:
        dataset_json["release"] = release
    if license is not None:
        dataset_json["licence"] = license
    if description is not None:
        dataset_json["description"] = description
    if overwrite_image_reader_writer is not None:
        dataset_json["overwrite_image_reader_writer"] = overwrite_image_reader_writer
    if regions_class_order is not None:
        dataset_json["regions_class_order"] = [int(i) for i in regions_class_order]
    dataset_json.update(kwargs)

    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(output_folder, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=4)
    return dataset_json


def create_filelist_dataset(source_dataset_dir: str, target_dataset_dir: str) -> Dict:
    """File-list dataset: a dataset.json whose ``"dataset"`` dict points at
    ANOTHER dataset's image/label files via relative paths, so no files are
    copied (reference ``Dataset988_dummyDataset4.py`` + the ``"dataset"``-key
    consumption in ``utilities/utils.py:51-66``). Consumers resolve the
    relative entries against the new dataset dir
    (``data/io.py:get_train_images_and_targets``)."""
    from ldiffusion_tpu.data.io import get_train_images_and_targets

    dataset = get_train_images_and_targets(source_dataset_dir)
    os.makedirs(target_dataset_dir, exist_ok=True)
    rel = {}
    for case, entry in dataset.items():
        rel[case] = {
            "images": [os.path.relpath(p, target_dataset_dir)
                       for p in entry["images"]],
            "label": os.path.relpath(entry["label"], target_dataset_dir),
        }
    with open(os.path.join(source_dataset_dir, "dataset.json")) as f:
        dataset_json = json.load(f)
    dataset_json["dataset"] = rel
    with open(os.path.join(target_dataset_dir, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=4)
    return dataset_json


def _write_dataset_json(path: str, num_training: int, num_classes: int,
                        file_ending: str = ".png", labels: Optional[Dict] = None):
    dataset_json = {
        "channel_names": {"0": "R", "1": "G", "2": "B"},
        "labels": labels or {"background": 0,
                             **{f"class{i}": i for i in range(1, num_classes)}},
        "numTraining": num_training,
        "file_ending": file_ending,
    }
    with open(os.path.join(path, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=4)


def convert_folder_dataset(image_dir: str, label_dir: str, out_dir: str,
                           num_classes: int, level: Optional[str] = None,
                           train_ratio: float = 1.0) -> str:
    """Generic converter: sorted image/label pairing, optional PUMA pixel →
    class-id mapping, case renaming to ``case_XXX_0000.png``."""
    from PIL import Image

    images = sorted(os.listdir(image_dir))
    labels = sorted(os.listdir(label_dir))
    assert len(images) == len(labels)
    n_train = int(round(len(images) * train_ratio))
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    lut = label_lut(level) if level else None
    for idx, (imf, lbf) in enumerate(zip(images, labels)):
        train = idx < n_train
        prefix = "case" if train else "caseTs"
        img_sub = "imagesTr" if train else "imagesTs"
        lbl_sub = "labelsTr" if train else "labelsTs"
        i = idx if train else idx - n_train
        img = Image.open(os.path.join(image_dir, imf)).convert("RGB")
        img.save(os.path.join(out_dir, img_sub, f"{prefix}_{i:03d}_0000.png"))
        lbl = np.asarray(Image.open(os.path.join(label_dir, lbf)).convert("L"), np.uint8)
        if lut is not None:
            lbl = lut[lbl]
        Image.fromarray(lbl).save(os.path.join(out_dir, lbl_sub, f"{prefix}_{i:03d}.png"))
    _write_dataset_json(out_dir, n_train, num_classes)
    return out_dir


def convert_puma(image_dir: str, label_dir: str, out_dir: str, level: str = "tissue",
                 train_ratio: float = 0.7) -> str:
    """PUMA melanoma ROIs: TIF/PNG images + pixel-convention masks
    (reference ``README.md:40-41,92``; mapping ``dataset.py:10-32``)."""
    from ldiffusion_tpu.data.labels import NUM_CLASSES

    return convert_folder_dataset(image_dir, label_dir, out_dir,
                                  NUM_CLASSES[level], level, train_ratio)


def convert_msd_dataset(msd_dir: str, out_dir: str) -> str:
    """Medical Segmentation Decathlon layout → dataset dir (reference
    ``dataset_conversion/convert_MSD_dataset.py``). Volumes are copied
    as-is with the MSD dataset.json translated."""
    src_json = json.load(open(os.path.join(msd_dir, "dataset.json")))
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        src = os.path.join(msd_dir, sub)
        dst = os.path.join(out_dir, sub)
        os.makedirs(dst, exist_ok=True)
        if os.path.isdir(src):
            for fn in os.listdir(src):
                if fn.startswith("."):
                    continue
                shutil.copy(os.path.join(src, fn), os.path.join(dst, fn))
    labels = {str(v) if not isinstance(v, str) else v: int(k) if k.isdigit() else k
              for k, v in src_json.get("labels", {}).items()}
    # MSD maps id->name; ours maps name->id
    name_to_id = {}
    for k, v in src_json.get("labels", {}).items():
        name_to_id[str(v)] = int(k)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "dataset.json"), "w") as f:
        json.dump({
            "channel_names": {str(i): m for i, m in
                              enumerate(src_json.get("modality", {"0": "img"}).values())},
            "labels": name_to_id or {"background": 0},
            "numTraining": src_json.get("numTraining", 0),
            "file_ending": ".nii.gz",
        }, f, indent=4)
    return out_dir


def generate_integration_test_dataset(out_dir: str, n_cases: int = 6, size: int = 64,
                                      num_classes: int = 4, seed: int = 0,
                                      regime: str = "plain") -> str:
    """Synthetic dataset generator covering the reference's four label
    regimes (Dataset996-999: plain / ignore / regions / regions+ignore,
    reference ``dataset_conversion/datasets_for_integration_tests/``)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    n_train = max(1, int(n_cases * 0.7))
    for idx in range(n_cases):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        lab = np.zeros((size, size), np.uint8)
        for c in range(1, num_classes):
            cy, cx = rng.integers(8, size - 8, 2)
            yy, xx = np.mgrid[:size, :size]
            lab[(yy - cy) ** 2 + (xx - cx) ** 2 < 36] = c
        if regime in ("ignore", "regions_ignore"):
            lab[:2] = num_classes  # ignore label = num_classes
        train = idx < n_train
        prefix, img_sub, lbl_sub = (
            ("case", "imagesTr", "labelsTr") if train else ("caseTs", "imagesTs", "labelsTs"))
        i = idx if train else idx - n_train
        Image.fromarray(img).save(os.path.join(out_dir, img_sub, f"{prefix}_{i:03d}_0000.png"))
        Image.fromarray(lab).save(os.path.join(out_dir, lbl_sub, f"{prefix}_{i:03d}.png"))

    labels: Dict = {"background": 0, **{f"class{i}": i for i in range(1, num_classes)}}
    if regime in ("regions", "regions_ignore"):
        labels = {"background": 0,
                  "whole": tuple(range(1, num_classes)),
                  "core": (num_classes - 1,)}
    if regime in ("ignore", "regions_ignore"):
        labels["ignore"] = num_classes
    dataset_json = {
        "channel_names": {"0": "R", "1": "G", "2": "B"},
        "labels": {k: list(v) if isinstance(v, tuple) else v for k, v in labels.items()},
        "numTraining": n_train,
        "file_ending": ".png",
    }
    if regime in ("regions", "regions_ignore"):
        dataset_json["regions_class_order"] = list(range(1, num_classes))
    with open(os.path.join(out_dir, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=4)
    return out_dir
