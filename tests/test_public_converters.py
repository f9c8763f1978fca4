"""Public-dataset converters (reference ``dataset_conversion/DatasetXXX_*.py``)
against synthetic source trees, plus the dataset.json ``"dataset"`` file-list
indirection (reference ``utilities/utils.py:51-66``)."""
import json
import os

import numpy as np
import pytest

from ldiffusion_tpu.data.converters import (
    create_filelist_dataset,
    generate_dataset_json,
    generate_integration_test_dataset,
)
from ldiffusion_tpu.data import public_converters as pc


def _touch(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


# ---------------------------------------------------------------------------
# generate_dataset_json
# ---------------------------------------------------------------------------

def test_generate_dataset_json_normalizes_and_validates(tmp_path):
    out = str(tmp_path)
    dj = generate_dataset_json(
        out, channel_names={0: "CT", 1: "MR"},
        labels={"background": 0, "a": np.int64(1), "whole": (1, 2)},
        num_training_cases=3, file_ending=".png",
        regions_class_order=(1, 2), license="L", dataset_name="D",
        extra_key="kept")
    on_disk = json.load(open(os.path.join(out, "dataset.json")))
    assert on_disk == dj
    assert set(dj["channel_names"]) == {"0", "1"}  # str keys
    assert dj["labels"]["whole"] == [1, 2]
    assert isinstance(dj["labels"]["a"], int)
    assert dj["licence"] == "L"  # reference's spelling
    assert dj["name"] == "D"
    assert dj["extra_key"] == "kept"


def test_generate_dataset_json_regions_require_order(tmp_path):
    with pytest.raises(ValueError):
        generate_dataset_json(str(tmp_path), {0: "CT"},
                              {"background": 0, "r": (1, 2)}, 1, ".png")


# ---------------------------------------------------------------------------
# ACDC / EMIDEC (copy + rename family)
# ---------------------------------------------------------------------------

def test_convert_acdc_layout(tmp_path):
    src = tmp_path / "acdc"
    for p, frames in (("patient001", (1, 12)), ("patient002", (2, 9))):
        for fr in frames:
            _touch(str(src / "training" / p / f"{p}_frame{fr:02d}.nii.gz"))
            _touch(str(src / "training" / p / f"{p}_frame{fr:02d}_gt.nii.gz"))
        _touch(str(src / "training" / p / f"{p}_4d.nii.gz"))  # excluded
    _touch(str(src / "testing" / "patient101" / "patient101_frame01.nii.gz"))

    out = pc.convert_acdc(str(src), raw_root=str(tmp_path / "raw"))
    imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
    labs = sorted(os.listdir(os.path.join(out, "labelsTr")))
    assert imgs == ["patient001_frame01_0000.nii.gz",
                    "patient001_frame12_0000.nii.gz",
                    "patient002_frame02_0000.nii.gz",
                    "patient002_frame09_0000.nii.gz"]
    assert labs == ["patient001_frame01.nii.gz", "patient001_frame12.nii.gz",
                    "patient002_frame02.nii.gz", "patient002_frame09.nii.gz"]
    assert os.listdir(os.path.join(out, "imagesTs")) == [
        "patient101_frame01_0000.nii.gz"]
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 4
    assert dj["labels"] == {"background": 0, "RV": 1, "MLV": 2, "LVC": 3}


def test_convert_emidec_layout(tmp_path):
    src = tmp_path / "emidec"
    for p in ("Case_P001", "Case_P002"):
        _touch(str(src / "train" / p / "Images" / f"{p}.nii.gz"))
        _touch(str(src / "train" / p / "Contours" / f"{p}.nii.gz"))
    _touch(str(src / "test" / "Case_T001" / "Images" / "Case_T001.nii.gz"))
    out = pc.convert_emidec(str(src / "train"), str(src / "test"),
                            raw_root=str(tmp_path / "raw"))
    assert sorted(os.listdir(os.path.join(out, "imagesTr"))) == [
        "Case_P001_0000.nii.gz", "Case_P002_0000.nii.gz"]
    assert sorted(os.listdir(os.path.join(out, "labelsTr"))) == [
        "Case_P001.nii.gz", "Case_P002.nii.gz"]
    assert json.load(open(os.path.join(out, "dataset.json")))["numTraining"] == 2


# ---------------------------------------------------------------------------
# BraTS21 label conventions
# ---------------------------------------------------------------------------

def test_brats_label_remap_round_trip():
    rng = np.random.default_rng(0)
    seg = rng.choice([0, 1, 2, 4], size=(4, 8, 8))
    mapped = pc.brats_labels_to_nnunet(seg)
    assert set(np.unique(mapped)) <= {0, 1, 2, 3}
    assert np.all((seg == 4) == (mapped == 3))
    assert np.all((seg == 2) == (mapped == 1))
    assert np.all((seg == 1) == (mapped == 2))
    assert np.array_equal(pc.convert_labels_back_to_brats(mapped), seg)


def test_brats_label_remap_rejects_unknown():
    with pytest.raises(RuntimeError):
        pc.brats_labels_to_nnunet(np.array([0, 3]))


def test_convert_brats21_files_npy(tmp_path):
    src = tmp_path / "brats"
    rng = np.random.default_rng(1)
    seg = rng.choice([0, 1, 2, 4], size=(3, 6, 6)).astype(np.int16)
    for case in ("BraTS2021_00000", "BraTS2021_00002"):
        cdir = src / case
        os.makedirs(cdir)
        for mod in pc.BRATS_MODALITIES:
            np.save(str(cdir / f"{case}_{mod}.npy"),
                    rng.random((3, 6, 6), dtype=np.float32))
        np.save(str(cdir / f"{case}_seg.npy"), seg)

    out = pc.convert_brats21(str(src), raw_root=str(tmp_path / "raw"),
                             file_ending=".npy")
    imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
    assert len(imgs) == 8 and imgs[0] == "BraTS2021_00000_0000.npy"
    remapped = np.load(os.path.join(out, "labelsTr", "BraTS2021_00000.npy"))
    assert np.array_equal(remapped, pc.brats_labels_to_nnunet(seg))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["labels"]["whole tumor"] == [1, 2, 3]
    assert dj["regions_class_order"] == [1, 2, 3]

    back = tmp_path / "back"
    n = pc.convert_folder_with_preds_back_to_brats(
        os.path.join(out, "labelsTr"), str(back), file_ending=".npy")
    assert n == 2
    assert np.array_equal(np.load(str(back / "BraTS2021_00000.npy")), seg)


# ---------------------------------------------------------------------------
# AMOS task 1/2 — dataset.json-driven with CT cutoffs
# ---------------------------------------------------------------------------

def _make_amos(tmp_path):
    src = tmp_path / "amos"
    ids = {"training": [5, 200, 410, 411, 550],
           "test": [450, 501], "validation": [300, 409, 412]}
    dj = {"labels": {"0": "background", "1": "spleen", "2": "kidney"},
          "training": [], "test": [], "validation": []}
    for split, nums in ids.items():
        img_sub = {"training": "imagesTr", "test": "imagesTs",
                   "validation": "imagesVa"}[split]
        lbl_sub = {"training": "labelsTr", "validation": "labelsVa"}.get(split)
        for n in nums:
            ident = f"amos_{n:04d}"
            dj[split].append({"image": f"./{img_sub}/{ident}.nii.gz"})
            _touch(str(src / img_sub / f"{ident}.nii.gz"))
            if lbl_sub:
                _touch(str(src / lbl_sub / f"{ident}.nii.gz"))
    os.makedirs(src, exist_ok=True)
    json.dump(dj, open(src / "dataset.json", "w"))
    return src


def test_convert_amos_task1_ct_filter(tmp_path):
    src = _make_amos(tmp_path)
    out = pc.convert_amos(str(src), task=1, raw_root=str(tmp_path / "raw"))
    imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
    # training ≤410: 5,200,410; validation ≤409: 300,409
    assert imgs == ["amos_0005_0000.nii.gz", "amos_0200_0000.nii.gz",
                    "amos_0300_0000.nii.gz", "amos_0409_0000.nii.gz",
                    "amos_0410_0000.nii.gz"]
    # test ≤500: 450 only
    assert os.listdir(os.path.join(out, "imagesTs")) == ["amos_0450_0000.nii.gz"]
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["numTraining"] == 5
    assert dj["labels"] == {"background": 0, "spleen": 1, "kidney": 2}


def test_convert_amos_task2_keeps_all(tmp_path):
    src = _make_amos(tmp_path)
    out = pc.convert_amos(str(src), task=2, raw_root=str(tmp_path / "raw"))
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 8  # 5 train + 3 val
    assert json.load(open(os.path.join(out, "dataset.json")))["numTraining"] == 8


# ---------------------------------------------------------------------------
# KiTS2023 / AutoPET
# ---------------------------------------------------------------------------

def test_convert_kits2023_regions(tmp_path):
    src = tmp_path / "kits"
    for c in ("case_00000", "case_00001", "case_00003"):
        _touch(str(src / c / "imaging.nii.gz"))
        _touch(str(src / c / "segmentation.nii.gz"))
    out = pc.convert_kits2023(str(src), raw_root=str(tmp_path / "raw"))
    assert len(os.listdir(os.path.join(out, "imagesTr"))) == 3
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["labels"]["kidney"] == [1, 2, 3]
    assert dj["regions_class_order"] == [1, 3, 2]


def test_convert_autopet_patient_stratified_splits(tmp_path):
    src = tmp_path / "autopet"
    patients = [f"PETCT_{i:03d}" for i in range(7)]
    for p in patients:
        for acq in ("2020-01-01", "2021-06-15")[: 1 + (int(p[-1]) % 2)]:
            for fn in ("CTres.nii.gz", "SUV.nii.gz", "SEG.nii.gz"):
                _touch(str(src / p / acq / fn))
    pp = tmp_path / "pp"
    out = pc.convert_autopet(str(src), raw_root=str(tmp_path / "raw"),
                             preprocessed_root=str(pp))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    n_imgs = len(os.listdir(os.path.join(out, "imagesTr")))
    assert n_imgs == 2 * dj["numTraining"]  # two channels per acquisition

    splits = json.load(open(pp / os.path.basename(out) / "splits_final.json"))
    assert len(splits) == 5
    for fold, split in enumerate(splits):
        val_patients = set(patients[fold::5])
        for ident in split["val"]:
            assert any(ident.startswith(v) for v in val_patients)
        for ident in split["train"]:
            assert not any(ident.startswith(v) for v in val_patients)
        assert len(split["train"]) + len(split["val"]) == dj["numTraining"]


# ---------------------------------------------------------------------------
# MNMs — 4D frame extraction + vendor splits
# ---------------------------------------------------------------------------

def _make_mnms(tmp_path, n_a=3, n_b=3):
    src = tmp_path / "mnms"
    rows = ["External code,Vendor,ED,ES"]
    rng = np.random.default_rng(2)
    patients = []
    for i in range(n_a + n_b):
        p = f"P{i:03d}"
        vendor = "A" if i < n_a else "B"
        ed, es = 0, 2
        rows.append(f"{p},{vendor},{ed},{es}")
        patients.append(p)
        pdir = src / "Training" / "Labeled" / p
        os.makedirs(pdir)
        np.save(str(pdir / f"{p}_sa.npy"),
                rng.random((4, 4, 3, 5), dtype=np.float32))  # (H,W,D,T)
        np.save(str(pdir / f"{p}_sa_gt.npy"),
                rng.integers(0, 4, (4, 4, 3, 5)).astype(np.uint8))
    tdir = src / "Testing" / "T000"
    os.makedirs(tdir)
    np.save(str(tdir / "T000_sa.npy"), rng.random((4, 4, 3, 5),
                                                  dtype=np.float32))
    rows.append("T000,C,1,3")
    csv_name = "info.csv"
    with open(src / csv_name, "w") as f:
        f.write("\n".join(rows))
    return src, csv_name, patients


def test_convert_mnms_frame_extraction(tmp_path):
    src, csv_name, _ = _make_mnms(tmp_path)
    out = pc.convert_mnms(str(src), csv_name, raw_root=str(tmp_path / "raw"),
                          file_ending=".npy")
    imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
    assert "P000_frame00_0000.npy" in imgs and "P000_frame02_0000.npy" in imgs
    assert len(imgs) == 12  # 6 patients x 2 phases
    labs = sorted(os.listdir(os.path.join(out, "labelsTr")))
    assert "P000_frame00.npy" in labs and len(labs) == 12
    # extracted frame is the right 3D slice of the 4D stack
    vol4d = np.load(str(src / "Training" / "Labeled" / "P000" / "P000_sa.npy"))
    frame = np.load(os.path.join(out, "imagesTr", "P000_frame02_0000.npy"))
    assert np.array_equal(frame, vol4d[..., 2])
    # test split: frames from the csv's T000 row (ED=1, ES=3)
    ts = sorted(os.listdir(os.path.join(out, "imagesTs")))
    assert ts == ["T000_frame01_0000.npy", "T000_frame03_0000.npy"]


def test_mnms_custom_splits(tmp_path):
    src, csv_name, patients = _make_mnms(tmp_path, n_a=3, n_b=4)
    splits_file = tmp_path / "splits_final.json"
    json.dump([{"train": ["x"], "val": ["y"]}] * 5, open(splits_file, "w"))
    splits = pc.create_mnms_custom_splits(str(src), csv_name,
                                          str(splits_file),
                                          num_val_patients=1)
    assert len(splits) == 5 + 12  # 4 train sets x 3 val sets appended
    on_disk = json.load(open(splits_file))
    assert on_disk == splits
    info = pc.read_mnms_csv(str(src / csv_name))
    for s in splits[5:]:
        assert len(set(s["train"]) & set(s["val"])) == 0
        # val sets are built from held-out patients only
        for frame_id in s["val"]:
            assert frame_id.rsplit("_frame", 1)[0] in info
    # val-on-A / val-on-B / val-on-A+B cycle: |val_AB| = |val_A| + |val_B|
    assert len(splits[7]["val"]) == len(splits[5]["val"]) + len(splits[6]["val"])


# ---------------------------------------------------------------------------
# Fluo C3DH (tif + spacing sidecars + 2-fold split)
# ---------------------------------------------------------------------------

def test_convert_fluo_c3dh(tmp_path):
    src = tmp_path / "fluo_train"
    for seq in ("01", "02"):
        for i in range(2):
            _touch(str(src / seq / f"t{i:03d}.tif"))
            _touch(str(src / f"{seq}_GT" / "SEG" / f"man_seg{i:03d}.tif"))
    pp = tmp_path / "pp"
    out = pc.convert_fluo_c3dh_a549_sim(str(src), None,
                                        raw_root=str(tmp_path / "raw"),
                                        preprocessed_root=str(pp))
    imgs = sorted(os.listdir(os.path.join(out, "imagesTr")))
    assert "01_image_000_0000.tif" in imgs and "02_image_001_0000.tif" in imgs
    # spacing sidecars for every image and label
    sidecar = json.load(open(os.path.join(out, "imagesTr",
                                          "01_image_000_0000.json")))
    assert sidecar["spacing"] == [1.0, 0.126, 0.126]
    assert os.path.exists(os.path.join(out, "labelsTr", "01_image_000.json"))
    dj = json.load(open(os.path.join(out, "dataset.json")))
    assert dj["overwrite_image_reader_writer"] == "Tiff3DIO"
    splits = json.load(open(pp / os.path.basename(out) / "splits_final.json"))
    assert len(splits) == 2
    assert all(c.startswith("01_") for c in splits[0]["train"])
    assert all(c.startswith("02_") for c in splits[0]["val"])


# ---------------------------------------------------------------------------
# RoadSegmentation — white-area cleanup
# ---------------------------------------------------------------------------

def test_road_segmentation_cleanup_logic():
    img = np.full((32, 32, 3), 100, np.uint8)
    img[4:20, 4:20] = 255          # large white no-data block (256 px)
    img[28:30, 28:30] = 255        # small white speck (4 px < 50)
    seg = np.zeros((32, 32), np.uint8)
    seg[:, 10] = 255               # road column crossing the white block
    cleaned = pc.road_segmentation_clean_case(img, seg, min_component_size=50)
    assert set(np.unique(cleaned)) <= {0, 1}          # 255 -> 1
    assert cleaned[2, 10] == 1                         # outside white: kept
    assert np.all(cleaned[4:20, 10] == 0)              # inside white: removed
    # speck is below min size: roads there would be kept
    seg2 = np.zeros((32, 32), np.uint8)
    seg2[28:30, 28:30] = 255
    assert np.all(pc.road_segmentation_clean_case(img, seg2, 50)[28:30, 28:30] == 1)


def test_convert_road_segmentation_files(tmp_path):
    from PIL import Image

    src = tmp_path / "road"
    for split in ("training", "testing"):
        os.makedirs(src / split / "input")
        os.makedirs(src / split / "output")
    img = np.full((16, 16, 3), 90, np.uint8)
    seg = np.zeros((16, 16), np.uint8)
    seg[3] = 255
    Image.fromarray(img).save(src / "training" / "input" / "a.png")
    Image.fromarray(seg).save(src / "training" / "output" / "a.png")
    # an image WITHOUT segmentation must be skipped
    Image.fromarray(img).save(src / "training" / "input" / "b.png")
    out = pc.convert_road_segmentation(str(src), raw_root=str(tmp_path / "raw"))
    assert os.listdir(os.path.join(out, "imagesTr")) == ["a_0000.png"]
    lab = np.asarray(Image.open(os.path.join(out, "labelsTr", "a.png")))
    assert set(np.unique(lab)) == {0, 1}
    assert json.load(open(os.path.join(out, "dataset.json")))["numTraining"] == 1


# ---------------------------------------------------------------------------
# Dataset988 analog: file-list dataset + consumption
# ---------------------------------------------------------------------------

def test_filelist_dataset_round_trip(tmp_path):
    from ldiffusion_tpu.data.io import get_train_images_and_targets

    src = str(tmp_path / "Dataset900_Source")
    generate_integration_test_dataset(src, n_cases=4, size=32, num_classes=3)
    target = str(tmp_path / "Dataset988_Filelist")
    dj = create_filelist_dataset(src, target)
    # no image files copied — only dataset.json
    assert os.listdir(target) == ["dataset.json"]
    # relative paths resolve back to the source's files
    dataset = get_train_images_and_targets(target)
    assert len(dataset) == len(dj["dataset"]) > 0
    for case, entry in dataset.items():
        assert os.path.isfile(entry["images"][0]), entry
        assert os.path.isfile(entry["label"])
        assert os.path.realpath(entry["label"]).startswith(
            os.path.realpath(src))


def test_filelist_dataset_drives_png_loader(tmp_path):
    from ldiffusion_tpu.segmentor.cli import load_png_cases

    src = str(tmp_path / "Dataset901_Source")
    generate_integration_test_dataset(src, n_cases=4, size=32, num_classes=3)
    target = str(tmp_path / "Dataset989_Filelist")
    create_filelist_dataset(src, target)
    ids, images, labels = load_png_cases(target, "Tr")
    ids_src, images_src, labels_src = load_png_cases(src, "Tr")
    assert ids == ids_src and len(images) == len(images_src)
    assert np.array_equal(images[0], images_src[0])
    assert np.array_equal(labels[0], labels_src[0])


def test_scan_fallback_matches_previous_behavior(tmp_path):
    from ldiffusion_tpu.data.io import get_train_images_and_targets

    src = str(tmp_path / "Dataset902_Scan")
    generate_integration_test_dataset(src, n_cases=3, size=32, num_classes=3)
    dataset = get_train_images_and_targets(src)
    for case, entry in dataset.items():
        assert entry["images"][0].endswith(f"{case}_0000.png")
        assert entry["label"].endswith(f"{case}.png")


# ---------------------------------------------------------------------------
# CLI smoke
# ---------------------------------------------------------------------------

def test_public_converters_cli_smoke(tmp_path, capsys):
    src = tmp_path / "kits"
    _touch(str(src / "case_00000" / "imaging.nii.gz"))
    _touch(str(src / "case_00000" / "segmentation.nii.gz"))
    pc.main(["kits2023", "-i", str(src), "--raw_root", str(tmp_path / "raw")])
    assert "done:" in capsys.readouterr().out
    assert os.path.isdir(tmp_path / "raw" / "Dataset220_KiTS2023")


def test_load_png_cases_groups_channel_files(tmp_path):
    """Multi-channel PNG cases (<case>_0000/_0001) stack their native
    channels in both the scan and the file-list routes (reference
    NaturalImage2DIO vstack + create_lists_from_splitted_dataset_folder)."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.cli import load_png_cases

    src = tmp_path / "Dataset903_TwoChan"
    os.makedirs(src / "imagesTr")
    os.makedirs(src / "labelsTr")
    rng = np.random.default_rng(7)
    ch0 = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    ch1 = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    Image.fromarray(ch0).save(src / "imagesTr" / "a_0000.png")
    Image.fromarray(ch1).save(src / "imagesTr" / "a_0001.png")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(src / "labelsTr" / "a.png")
    json.dump({"channel_names": {"0": "c0", "1": "c1"},
               "labels": {"background": 0}, "numTraining": 1,
               "file_ending": ".png"}, open(src / "dataset.json", "w"))

    ids, images, labels = load_png_cases(str(src), "Tr")
    assert ids == ["a"]                      # ONE case, not two
    assert images[0].shape == (8, 8, 2)      # both channels stacked
    np.testing.assert_allclose(images[0][..., 0], ch0 / 255.0, atol=1e-6)
    np.testing.assert_allclose(images[0][..., 1], ch1 / 255.0, atol=1e-6)

    # file-list indirection returns the same stacking
    target = str(tmp_path / "Dataset904_Filelist")
    create_filelist_dataset(str(src), target)
    ids2, images2, _ = load_png_cases(target, "Tr")
    assert ids2 == ["a"]
    np.testing.assert_array_equal(images2[0], images[0])


def test_nibabel_reorient_registered_and_selected(tmp_path):
    """NibabelIOWithReorient resolves via overwrite_image_reader_writer
    (instantiation raises cleanly when nibabel is missing); round-trip is
    exercised when nibabel exists."""
    from ldiffusion_tpu.data.io import (
        _BY_NAME,
        determine_reader_writer_from_dataset_json,
    )

    assert "NibabelIOWithReorient" in _BY_NAME
    dj = {"overwrite_image_reader_writer": "NibabelIOWithReorient",
          "file_ending": ".nii.gz"}
    try:
        import nibabel  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            determine_reader_writer_from_dataset_json(dj)
        return

    # nibabel available: LPS-stored volume reorients to RAS on read and the
    # written seg restores the original affine
    rw = determine_reader_writer_from_dataset_json(dj)
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])  # LPS-ish
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    src = str(tmp_path / "v.nii.gz")
    nibabel.save(nibabel.Nifti1Image(vol, affine), src)
    data, props = rw.read_images([src])
    assert data.shape[0] == 1
    out = str(tmp_path / "s.nii.gz")
    rw.write_seg(data[0].astype(np.uint8), out, props)
    restored = nibabel.load(out)
    np.testing.assert_allclose(restored.affine, affine)
