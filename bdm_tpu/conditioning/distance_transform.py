"""Mask distance transform for conditioning.

Reference: `model/model_utils.py:13-21` — cv2 L2 distance transform of the
inverted mask, divided by image_size/2, clipped to [0, 1], computed on CPU
per mask. This is image preprocessing (constant per sample), so it runs
host-side in the data path and ships with the batch — never inside jit.
"""

from __future__ import annotations

import numpy as np


def compute_distance_transform(mask: np.ndarray) -> np.ndarray:
    """mask: (B, H, W) or (B, H, W, 1) binary/float foreground mask.
    Returns (B, H, W, 1) float32 distances, matching the reference scale.
    """
    mask = np.asarray(mask)
    if mask.ndim == 4:
        mask = mask[..., 0]
    if mask.dtype != np.uint8:
        mask = (mask > 0.5).astype(np.uint8)
    image_size = mask.shape[-1]
    out = np.stack([_edt_l2(1 - m) for m in mask])
    out = np.clip(out / (image_size / 2.0), 0.0, 1.0)
    return out[..., None].astype(np.float32)


def _edt_l2(img: np.ndarray) -> np.ndarray:
    """L2 distance of nonzero pixels to the nearest zero pixel."""
    try:
        import cv2
        return cv2.distanceTransform(img.astype(np.uint8), cv2.DIST_L2,
                                     cv2.DIST_MASK_3)
    except ImportError:
        from scipy import ndimage
        return ndimage.distance_transform_edt(img).astype(np.float32)
