"""Image and ground-truth-depth readers.

GT depth dialects (cas_total_rscv.py:432-451):
- ``whu_mvs``:    16-bit png, depth = png / 64
- ``dtu`` / ``BlendedMVS``: PFM
- ``whu_omvs``:   EXR + sibling mask png under ``masks/`` — pixels whose mask
  value < 0.5 are zeroed.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from . import native
from .exr import read_exr_depth as _read_exr_depth_py
from .pfm import read_pfm


def read_image(path: str) -> np.ndarray:
    """RGB uint8 [H,W,3]. PNGs decode through the native library when built."""
    if path.lower().endswith(".png") and native.available():
        try:
            img = native.read_png(path)
            if img.dtype == np.uint8:
                if img.ndim == 2:
                    return np.repeat(img[..., None], 3, axis=-1)
                if img.shape[2] == 4 or img.shape[2] == 2:
                    img = img[..., :3] if img.shape[2] == 4 else np.repeat(img[..., :1], 3, -1)
                return np.ascontiguousarray(img[..., :3])
        except ValueError:
            pass  # unsupported PNG flavor -> PIL
    with Image.open(path) as img:
        return np.array(img.convert("RGB"))


def read_exr_depth(path: str) -> np.ndarray:
    if native.available():
        try:
            return native.read_exr_depth(path)
        except ValueError:
            pass
    return _read_exr_depth_py(path)


def read_gt_depth(path: str, set_name: str) -> np.ndarray:
    if set_name == "whu_mvs":
        with Image.open(path) as img:
            return np.asarray(img, dtype=np.float32) / 64.0
    if set_name in ("dtu", "BlendedMVS"):
        return np.asarray(read_pfm(path)[0], dtype=np.float32)
    if set_name == "whu_omvs":
        depth = read_exr_depth(path)
        mask_path = path.replace("depths", "masks").replace(".exr", ".png")
        with Image.open(mask_path) as m:
            mask = np.asarray(m.convert("L"), dtype=np.float32) / 255.0
        depth = depth.copy()
        depth[mask < 0.5] = 0.0
        return depth
    raise ValueError(f"unknown set_name {set_name!r}")
