"""Adversarial object (car) image preparation.

Re-design of image_preprocess.py:18-65: resize the object PNG to width
300 preserving aspect, binarize the companion *_CarMask at 0.5, and
build the paint mask — a 0.5-filled "half mask" when the paint-mask id
is negative (process_car_img :51-65), else the binarized
*_PaintMask<id> file. Outputs are NHWC float arrays ready for the
attack/EoT stack ((1,H,W,3) object in [0,1], (1,H,W,1) masks).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

CAR_IMG_WIDTH = 300  # image_preprocess.py:11


def _load_resized(path: str, output_w: int = CAR_IMG_WIDTH):
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB")
    w, h = img.size
    output_h = int(output_w / w * h)
    return img.resize((output_w, output_h)), output_w, output_h


def _load_mask(path: str, output_w: int, output_h: int) -> np.ndarray:
    from PIL import Image, ImageOps

    if not os.path.exists(path):
        # missing mask -> whole image (image_preprocess.py:39-40)
        return np.ones((output_h, output_w), np.float32)
    with open(path, "rb") as f:
        m = ImageOps.grayscale(Image.open(f))
    m = np.asarray(m.resize((output_w, output_h)), np.float32) / 255.0
    return (m > 0.5).astype(np.float32)


def process_car_img(img_path: str, paint_mask_no: str = "-2",
                    output_w: int = CAR_IMG_WIDTH
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (obj (1,H,W,3) float, car_mask (1,H,W,1),
    paint_mask (1,H,W,1)).

    paint_mask_no < 0 -> constant 0.5 "half mask"
    (image_preprocess.py:55-58); otherwise loads
    <name>_PaintMask<no><ext>.
    """
    base, ext = os.path.splitext(img_path)
    img, w, h = _load_resized(img_path, output_w)
    obj = np.asarray(img, np.float32)[None] / 255.0
    car_mask = _load_mask(base + "_CarMask" + ext, w, h)
    if int(paint_mask_no) < 0:
        paint_mask = np.full_like(car_mask, 0.5)
    else:
        paint_mask = _load_mask(base + "_PaintMask" + paint_mask_no + ext,
                                w, h)
    return obj, car_mask[None, ..., None], paint_mask[None, ..., None]
