"""Visualization helpers (reference `src/s3od/visualizer.py:8-48`)."""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
from PIL import Image

from s3od_tpu.predictor import RemovalResult


def visualize_removal(
    image: Union[np.ndarray, Image.Image],
    result: RemovalResult,
    background_color: Tuple[int, int, int] = (0, 255, 0),
) -> Image.Image:
    """Soft-mask composite over a solid background color."""
    if isinstance(image, Image.Image):
        image = np.array(image.convert("RGB"))
    mask = result.predicted_mask[..., None]
    background = np.full_like(image, background_color, dtype=np.uint8)
    composite = (mask * image + (1 - mask) * background).astype(np.uint8)
    return Image.fromarray(composite)


def visualize_all_masks(
    image: Union[np.ndarray, Image.Image],
    result: RemovalResult,
) -> Image.Image:
    """Grid of all candidate masks applied to the image (up to 4 per row)."""
    if isinstance(image, Image.Image):
        image = np.array(image.convert("RGB"))
    h, w = image.shape[:2]
    num_masks = len(result.all_masks)
    grid_w = min(num_masks, 4)
    grid_h = (num_masks + grid_w - 1) // grid_w
    grid = np.zeros((h * grid_h, w * grid_w, 3), dtype=np.uint8)
    for idx, mask in enumerate(result.all_masks):
        r, c = idx // grid_w, idx % grid_w
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = (
            mask[..., None] * image
        ).astype(np.uint8)
    return Image.fromarray(grid)
