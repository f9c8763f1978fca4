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


_REGISTRY = [NaturalImage2DIO, NibabelIO]


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
    return determine_reader_writer(dataset_json.get("file_ending", ".png"))
