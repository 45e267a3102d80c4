"""Generate a procedural salient-object dataset for end-to-end training demos.

Richer than the factory's ProceduralBackend blob: textured/gradient
backgrounds, one salient composite shape (ellipse/polygon/blob union) with
distinct color statistics, soft edges on the image but a crisp GT mask —
enough signal that a from-scratch-head model must actually learn shape/color
grouping (loss down, val dice up), while staying generation-cheap.

Usage: python scripts/make_demo_dataset.py OUT_DIR --n 256 --size 256 --seed 0
Writes OUT_DIR/{images,masks}/NNNNN.png pairs (the reference dataset layout,
`synth_sod/model_training/dataset.py:34-144`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _background(rng, h, w):
    kind = rng.integers(0, 3)
    if kind == 0:  # smooth 2D gradient
        a, b = rng.uniform(-1, 1, 2)
        yy, xx = np.mgrid[0:h, 0:w]
        g = (a * yy / h + b * xx / w)
        g = (g - g.min()) / (np.ptp(g) + 1e-6)
        base = rng.uniform(40, 200, 3)
        span = rng.uniform(20, 80, 3)
        return np.clip(base + g[..., None] * span, 0, 255)
    if kind == 1:  # low-frequency noise texture
        small = rng.uniform(0, 255, (h // 16 + 1, w // 16 + 1, 3))
        img = np.asarray(
            Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR),
            np.float32,
        )
        return 0.5 * img + 0.25 * 255
    # speckle
    base = rng.uniform(60, 190, 3)
    return np.clip(base + rng.normal(0, 18, (h, w, 3)), 0, 255)


def _shape_mask(rng, h, w, obj_scale=1.0):
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.zeros((h, w), bool)
    n_parts = rng.integers(1, 4)
    cy0, cx0 = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
    s = obj_scale
    for _ in range(n_parts):
        cy = cy0 + rng.normal(0, 0.08) * h
        cx = cx0 + rng.normal(0, 0.08) * w
        kind = rng.integers(0, 2)
        if kind == 0:  # rotated ellipse
            ry = rng.uniform(0.08, 0.22) * h * s
            rx = rng.uniform(0.08, 0.22) * w * s
            th = rng.uniform(0, np.pi)
            y, x = yy - cy, xx - cx
            yr = y * np.cos(th) - x * np.sin(th)
            xr = y * np.sin(th) + x * np.cos(th)
            mask |= (yr / ry) ** 2 + (xr / rx) ** 2 <= 1
        else:  # convex polygon (random half-plane intersection around center)
            r = rng.uniform(0.1, 0.24) * min(h, w) * s
            poly = np.ones((h, w), bool)
            for ang in np.linspace(0, 2 * np.pi, rng.integers(4, 8), endpoint=False):
                d = rng.uniform(0.7, 1.0) * r
                ny, nx = np.sin(ang), np.cos(ang)
                poly &= (yy - cy) * ny + (xx - cx) * nx <= d
            mask |= poly
    return mask


def make_sample(rng, size, obj_scale=1.0):
    h = w = size
    img = _background(rng, h, w)
    mask = _shape_mask(rng, h, w, obj_scale)
    # Object coloring: shifted hue/brightness + its own texture.
    obj_color = rng.uniform(0, 255, 3)
    tex = rng.normal(0, 12, (h, w, 1))
    alpha = 0.75 + 0.25 * rng.random()
    img = np.where(
        mask[..., None], alpha * obj_color + (1 - alpha) * img + tex, img
    )
    return (
        np.clip(img, 0, 255).astype(np.uint8),
        (mask * 255).astype(np.uint8),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--obj-scale", type=float, default=1.0,
                    help="object radius multiplier (~13%% foreground at 1.0; "
                         "~30%% at 1.6 — a friendlier BCE class balance for "
                         "from-scratch demo runs)")
    args = ap.parse_args()

    out = Path(args.out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "masks").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img, mask = make_sample(rng, args.size, args.obj_scale)
        Image.fromarray(img).save(out / "images" / f"{i:05d}.png")
        Image.fromarray(mask).save(out / "masks" / f"{i:05d}.png")
    print(f"wrote {args.n} pairs under {out}")


if __name__ == "__main__":
    main()
