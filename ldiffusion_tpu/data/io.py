"""Image reader/writer registry.

Behavioral contract: nnUNet's imageio layer (reference
``imageio/reader_writer_registry.py``, ``natural_image_reader_writer.py:22-65``,
``{nibabel,simpleitk,tif}_reader_writer.py``): a reader/writer class is chosen
from the dataset's file ending; the 2D natural-image reader returns
(c, 1, X, Y) float32 with spacing (999, 1, 1) and writes uint8 PNG
segmentations.

This framework's native path is PIL (PNG/BMP/TIF); medical volume formats
(NIfTI via nibabel, anything via SimpleITK) are gated on those optional
libraries, mirroring the reference's optional-format support.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

NATURAL_2D_SPACING = (999.0, 1.0, 1.0)


class BaseReaderWriter:
    """Interface (reference ``imageio/base_reader_writer.py``)."""

    supported_endings: Tuple[str, ...] = ()

    def read_images(self, paths) -> Tuple[np.ndarray, Dict]:
        raise NotImplementedError

    def read_seg(self, path) -> Tuple[np.ndarray, Dict]:
        raise NotImplementedError

    def write_seg(self, seg: np.ndarray, path: str, properties: Optional[Dict] = None):
        raise NotImplementedError


class NaturalImage2DIO(BaseReaderWriter):
    """PNG/BMP/TIF/JPEG 2D (reference ``natural_image_reader_writer.py:22-65``):
    images to (c, 1, X, Y) float32, spacing (999,1,1); segs written uint8."""

    supported_endings = (".png", ".bmp", ".tif", ".tiff", ".jpg", ".jpeg")

    def read_images(self, paths):
        from PIL import Image

        stacks = []
        for p in paths:
            arr = np.asarray(Image.open(p)).astype(np.float32)
            if arr.ndim == 2:
                arr = arr[None]           # (1, X, Y)
            else:
                arr = arr.transpose(2, 0, 1)  # (c, X, Y)
            stacks.append(arr[:, None])   # (c, 1, X, Y)
        return np.vstack(stacks), {"spacing": list(NATURAL_2D_SPACING)}

    def read_seg(self, path):
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("L"), np.uint8)
        return arr[None, None].astype(np.float32), {"spacing": list(NATURAL_2D_SPACING)}

    def write_seg(self, seg, path, properties=None):
        from PIL import Image

        Image.fromarray(np.squeeze(seg).astype(np.uint8)).save(path)


class NibabelIO(BaseReaderWriter):
    """NIfTI via nibabel (gated; reference ``nibabel_reader_writer.py``)."""

    supported_endings = (".nii", ".nii.gz")

    def __init__(self):
        import nibabel  # noqa: F401  (raises if unavailable)

        self._nib = nibabel

    def read_images(self, paths):
        imgs = [self._nib.load(p) for p in paths]
        data = np.stack([np.asanyarray(i.dataobj).astype(np.float32).T for i in imgs])
        spacing = list(imgs[0].header.get_zooms()[::-1])
        return data, {"spacing": spacing, "affine": imgs[0].affine.tolist()}

    def read_seg(self, path):
        img = self._nib.load(path)
        return (np.asanyarray(img.dataobj).astype(np.float32).T[None],
                {"spacing": list(img.header.get_zooms()[::-1])})

    def write_seg(self, seg, path, properties=None):
        affine = np.asarray(properties["affine"]) if properties and "affine" in properties \
            else np.eye(4)
        self._nib.save(self._nib.Nifti1Image(np.squeeze(seg).T.astype(np.uint8),
                                             affine), path)


class NibabelIOWithReorient(BaseReaderWriter):
    """NIfTI via nibabel with reorientation to RAS on read and inverse
    reorientation on write (gated; reference
    ``nibabel_reader_writer.py:100-184``): images are loaded
    ``as_reoriented(io_orientation(original_affine))``, transposed to the
    sitk (z, y, x) axis order, spacing reversed; ``write_seg`` builds the
    seg on the reoriented affine, reorients back to the ORIGINAL affine and
    asserts the round trip restored it."""

    supported_endings = (".nii", ".nii.gz")

    def __init__(self):
        import nibabel  # noqa: F401  (raises if unavailable)

        self._nib = nibabel

    def read_images(self, paths):
        from nibabel.orientations import io_orientation

        arrays, original_affine, reoriented_affine, spacing = [], None, None, None
        for p in paths:
            img = self._nib.load(p)
            reoriented = img.as_reoriented(io_orientation(img.affine))
            if original_affine is None:
                original_affine = img.affine
                reoriented_affine = reoriented.affine
                spacing = [float(z) for z in reoriented.header.get_zooms()[::-1]]
            arrays.append(reoriented.get_fdata().transpose(2, 1, 0))
        return (np.stack(arrays).astype(np.float32),
                {"spacing": spacing,
                 "nibabel_stuff": {
                     "original_affine": original_affine.tolist(),
                     "reoriented_affine": reoriented_affine.tolist()}})

    def read_seg(self, path):
        return self.read_images([path])

    def write_seg(self, seg, path, properties=None):
        from nibabel.orientations import io_orientation

        assert properties and "nibabel_stuff" in properties, \
            "NibabelIOWithReorient.write_seg needs the read-side affines"
        original = np.asarray(properties["nibabel_stuff"]["original_affine"])
        reoriented = np.asarray(properties["nibabel_stuff"]["reoriented_affine"])
        seg_img = self._nib.Nifti1Image(
            np.squeeze(seg).transpose(2, 1, 0).astype(np.uint8), reoriented)
        restored = seg_img.as_reoriented(io_orientation(original))
        assert np.allclose(original, restored.affine), \
            "restored affine does not match original affine"
        self._nib.save(restored, path)


class SimpleITKIO(BaseReaderWriter):
    """Any-format volumes via SimpleITK (gated; reference
    ``imageio/simpleitk_reader_writer.py``): arrays come back (c, Z, H, W)
    float32 with itk's (x,y,z) spacing reversed to (z,y,x); segs written with
    spacing/origin/direction restored from properties."""

    supported_endings = (".mha", ".mhd", ".nrrd", ".gz", ".nii", ".nii.gz")

    def __init__(self):
        import SimpleITK  # noqa: F401  (raises if unavailable)

        self._sitk = SimpleITK

    def read_images(self, paths):
        sitk = self._sitk
        arrays, props = [], None
        for p in paths:
            img = sitk.ReadImage(p)
            arrays.append(sitk.GetArrayFromImage(img).astype(np.float32))
            if props is None:
                props = {
                    "spacing": list(img.GetSpacing())[::-1],
                    "origin": list(img.GetOrigin()),
                    "direction": list(img.GetDirection()),
                }
        data = np.stack(arrays)
        if data.ndim == 3:          # 2D images → (c, 1, X, Y)
            data = data[:, None]
        return data, props

    def read_seg(self, path):
        data, props = self.read_images([path])
        return data, props

    def write_seg(self, seg, path, properties=None):
        sitk = self._sitk
        img = sitk.GetImageFromArray(np.squeeze(seg).astype(np.uint8))
        if properties:
            if "spacing" in properties:
                img.SetSpacing(tuple(properties["spacing"][::-1]))
            if "origin" in properties:
                img.SetOrigin(tuple(properties["origin"]))
            if "direction" in properties:
                img.SetDirection(tuple(properties["direction"]))
        sitk.WriteImage(img, path)


class Tiff3DIO(BaseReaderWriter):
    """3D multipage TIFF via tifffile (gated; reference
    ``imageio/tif_reader_writer.py``): volumes (c, Z, H, W); spacing comes
    from a sibling ``<name>.json`` (the reference's convention) or defaults
    to unit."""

    supported_endings = (".tif", ".tiff")

    def __init__(self):
        import tifffile  # noqa: F401  (raises if unavailable)

        self._tiff = tifffile

    def _spacing_for(self, path: str):
        import json
        import os

        sidecar = os.path.splitext(path)[0] + ".json"
        if os.path.exists(sidecar):
            return list(json.load(open(sidecar)).get("spacing", (1.0, 1.0, 1.0)))
        return [1.0, 1.0, 1.0]

    def read_images(self, paths):
        vols = [self._tiff.imread(p).astype(np.float32) for p in paths]
        for v in vols:
            assert v.ndim == 3, f"Tiff3DIO expects 3D stacks, got {v.shape}"
        return np.stack(vols), {"spacing": self._spacing_for(paths[0])}

    def read_seg(self, path):
        vol = self._tiff.imread(path).astype(np.float32)
        return vol[None], {"spacing": self._spacing_for(path)}

    def write_seg(self, seg, path, properties=None):
        import json
        import os

        self._tiff.imwrite(path, np.squeeze(seg).astype(np.uint8))
        if properties and "spacing" in properties:
            with open(os.path.splitext(path)[0] + ".json", "w") as f:
                json.dump({"spacing": list(properties["spacing"])}, f)


class NumpyIO(BaseReaderWriter):
    """Volumes as bare ``.npy`` arrays with an optional ``<name>.json``
    spacing sidecar (Tiff3DIO's convention). Not in the reference registry —
    added so volumetric configs run with zero external IO dependencies
    (nibabel/SimpleITK/tifffile are all optional here); arrays are (Z, H, W)
    per channel file, returned (c, Z, H, W) like every other reader."""

    supported_endings = (".npy",)

    def _spacing_for(self, path: str):
        import json as _json

        sidecar = os.path.splitext(path)[0] + ".json"
        if os.path.exists(sidecar):
            return list(_json.load(open(sidecar)).get("spacing",
                                                      (1.0, 1.0, 1.0)))
        return [1.0, 1.0, 1.0]

    def read_images(self, paths):
        vols = [np.load(p).astype(np.float32) for p in paths]
        for v in vols:
            assert v.ndim == 3, f"NumpyIO expects (Z, H, W) arrays, got {v.shape}"
        return np.stack(vols), {"spacing": self._spacing_for(paths[0])}

    def read_seg(self, path):
        vol = np.load(path).astype(np.float32)
        return vol[None], {"spacing": self._spacing_for(path)}

    def write_seg(self, seg, path, properties=None):
        import json as _json

        np.save(path, np.squeeze(seg).astype(np.uint8))
        if properties and "spacing" in properties:
            with open(os.path.splitext(path)[0] + ".json", "w") as f:
                _json.dump({"spacing": list(properties["spacing"])}, f)


# order matters: 2D natural images claim .tif first (reference registry
# priority, ``reader_writer_registry.py``); Tiff3DIO is selected explicitly
# via dataset_json ``overwrite_image_reader_writer`` for 3D stacks
_REGISTRY = [NaturalImage2DIO, NibabelIO, NibabelIOWithReorient, SimpleITKIO,
             Tiff3DIO, NumpyIO]

_BY_NAME = {cls.__name__: cls for cls in _REGISTRY}


def determine_reader_writer(file_ending: str) -> BaseReaderWriter:
    """Reader selection by ending (reference
    ``reader_writer_registry.py:determine_reader_writer_from_dataset_json``)."""
    ending = file_ending.lower()
    errors = []
    for cls in _REGISTRY:
        if any(ending.endswith(e) for e in cls.supported_endings):
            try:
                return cls()
            except ImportError as e:
                errors.append(f"{cls.__name__}: {e}")
    raise ValueError(f"no reader/writer for '{file_ending}'"
                     + (f" (unavailable: {errors})" if errors else ""))


def determine_reader_writer_from_dataset_json(dataset_json: Dict) -> BaseReaderWriter:
    """Explicit ``overwrite_image_reader_writer`` wins (reference
    ``reader_writer_registry.py:20-40``), else ending-based dispatch."""
    name = dataset_json.get("overwrite_image_reader_writer")
    if name and name in _BY_NAME:
        return _BY_NAME[name]()
    return determine_reader_writer(dataset_json.get("file_ending", ".png"))


def group_channel_files(img_dir: str, ending: str) -> Dict[str, list]:
    """case-id -> [filenames]: channel files ``<case>_NNNN<ending>`` group
    per case; anything else is its own single-file case (reference
    ``utilities/utils.py`` create_lists_from_splitted_dataset_folder).
    Single source of truth for training AND prediction input grouping."""
    groups: Dict[str, list] = {}
    for fn in sorted(os.listdir(img_dir)):
        if not fn.lower().endswith(ending):
            continue
        stem = fn[: -len(ending)]
        case, _, ch = stem.rpartition("_")
        key = case if (case and ch.isdigit() and len(ch) == 4) else stem
        groups.setdefault(key, []).append(fn)
    return groups


def get_train_images_and_targets(ds_dir: str,
                                 dataset_json: Dict = None) -> Dict[str, Dict]:
    """case-id -> {"images": [abs paths], "label": abs path} for the
    training split.

    Two sources, matching the reference's
    ``utilities/utils.py:get_filenames_of_train_images_and_targets`` (:51-66):
    an explicit ``"dataset"`` dict in dataset.json (per-case image/label
    paths, relative entries resolved against the dataset dir — the
    Dataset988-style file-list indirection that lets a dataset borrow files
    from another without copying), else a scan of imagesTr/labelsTr with
    ``_NNNN`` channel grouping."""
    import json as _json

    if dataset_json is None:
        with open(os.path.join(ds_dir, "dataset.json")) as f:
            dataset_json = _json.load(f)

    if "dataset" in dataset_json:
        out: Dict[str, Dict] = {}
        for case, entry in dataset_json["dataset"].items():
            label = entry["label"]
            images = entry["images"]
            out[case] = {
                "images": [i if os.path.isabs(i)
                           else os.path.abspath(os.path.join(ds_dir, i))
                           for i in images],
                "label": label if os.path.isabs(label)
                else os.path.abspath(os.path.join(ds_dir, label)),
            }
        return out

    ending = dataset_json.get("file_ending", ".png").lower()
    img_dir = os.path.join(ds_dir, "imagesTr")
    lbl_dir = os.path.join(ds_dir, "labelsTr")
    groups = group_channel_files(img_dir, ending) if os.path.isdir(img_dir) else {}
    return {case: {"images": [os.path.join(img_dir, f) for f in files],
                   "label": os.path.join(lbl_dir, case + ending)}
            for case, files in groups.items()}
