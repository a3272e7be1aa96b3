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

from .exr import read_exr_depth
from .pfm import read_pfm


def read_image(path: str) -> np.ndarray:
    """RGB uint8 [H,W,3]."""
    with Image.open(path) as img:
        return np.array(img.convert("RGB"))


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
