"""Aspect-preserving letterbox math (reference `src/s3od/utils.py:6-37`)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def get_pad_info(image: np.ndarray, image_size: int = 1024) -> Dict[str, Any]:
    """Compute resize + center-pad geometry for a square canvas.

    Longest side maps to `image_size`; the short side is scaled to preserve
    aspect ratio and centered with equal (floor-divided) padding.
    """
    h, w = image.shape[:2]
    aspect_ratio = w / h
    if aspect_ratio > 1:
        new_w = image_size
        # max(1, ...): extreme aspect ratios (e.g. 1 x 5000) would otherwise
        # round the short side to 0 and crash the resize downstream.
        new_h = max(1, int(new_w / aspect_ratio))
        return {
            "height_pad": (image_size - new_h) // 2,
            "width_pad": 0,
            "original_size": (h, w),
            "resized_size": (new_h, new_w),
        }
    new_h = image_size
    new_w = max(1, int(new_h * aspect_ratio))
    return {
        "height_pad": 0,
        "width_pad": (image_size - new_w) // 2,
        "original_size": (h, w),
        "resized_size": (new_h, new_w),
    }


def remove_padding(masks: np.ndarray, pad_info: Dict[str, Any]) -> np.ndarray:
    """masks: (N, H, W). Crop the letterbox padding back out.

    Exact-size crop (the reference's symmetric `[pad:-pad]` slice,
    `src/s3od/utils.py:32-37`, is identical for even padding and
    off-by-one — paired with a crash upstream — for odd padding)."""
    hp, wp = pad_info["height_pad"], pad_info["width_pad"]
    nh, nw = pad_info["resized_size"]
    if hp > 0:
        masks = masks[:, hp : hp + nh, :]
    if wp > 0:
        masks = masks[:, :, wp : wp + nw]
    return masks
