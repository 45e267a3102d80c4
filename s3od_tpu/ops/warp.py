"""Batched geometric warps for on-device augmentation.

One bilinear grid-sample kernel serves every geometric distortion the
reference applies with albumentations (`model_training/transforms.py`):
Rotate(±15°) (:41), Perspective (:174-177), OpticalDistortion (:160-163),
GridDistortion (:164-168), ElasticTransform (:169-173). Each distortion is
just a different per-sample coordinate field; the field is selected per
sample and applied with a single gather, so adding distortion families costs
coordinate math (VPU) rather than extra image passes (HBM).

Coordinates are (y, x) in pixel units of the *source* image; out-of-range
samples use OpenCV's default BORDER_REFLECT_101 semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _reflect101(idx: jax.Array, n: int) -> jax.Array:
    """cv2.BORDER_REFLECT_101 index folding: ...2 1 | 0 1 2 ... n-1 | n-2..."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def grid_sample(img: jax.Array, coords: jax.Array,
                method: str = "linear") -> jax.Array:
    """Sample `img` (H, W, C) at float `coords` (H', W', 2) [(y, x) order].

    method: "linear" (bilinear) or "nearest" (masks keep hard labels, like
    albumentations' nearest mask interpolation).
    """
    h, w = img.shape[0], img.shape[1]
    cy, cx = coords[..., 0], coords[..., 1]
    flat = img.reshape(h * w, -1)

    def fetch(iy, ix):
        iy = _reflect101(iy, h)
        ix = _reflect101(ix, w)
        return jnp.take(flat, iy * w + ix, axis=0)

    if method == "nearest":
        out = fetch(jnp.round(cy).astype(jnp.int32),
                    jnp.round(cx).astype(jnp.int32))
        return out.reshape(coords.shape[0], coords.shape[1], -1)

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wy = (cy - y0)[..., None]
    wx = (cx - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    top = fetch(y0, x0) * (1 - wx) + fetch(y0, x0 + 1) * wx
    bot = fetch(y0 + 1, x0) * (1 - wx) + fetch(y0 + 1, x0 + 1) * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape(coords.shape[0], coords.shape[1], -1)


def batched_warp(images: jax.Array, masks: jax.Array,
                 coords: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Apply per-sample coordinate fields to images (bilinear) and masks
    (nearest). images (B,H,W,3), masks (B,H,W), coords (B,H,W,2)."""
    warped_i = jax.vmap(lambda im, c: grid_sample(im, c, "linear"))(
        images, coords
    )
    warped_m = jax.vmap(
        lambda m, c: grid_sample(m[..., None], c, "nearest")[..., 0]
    )(masks, coords)
    return warped_i, warped_m


def resample_rows_matmul(x: jax.Array, src: jax.Array,
                         method: str = "linear") -> jax.Array:
    """Per-sample 1D resample along axis 1 via interpolation-matrix matmul.

    x: (B, H, W, C); src: (B, H_out) float source row positions. Point
    gathers are ~40x slower than matmuls on v5e (measured: 37 ms vs <1 ms
    for 4M points at 1024²), so axis-separable resampling — zoom, pixelate,
    grid distortion — rides the MXU instead: out = M @ x with
    M[j,k] = max(0, 1-|src_j - k|) (linear) or one-hot(round(src)) (nearest).
    """
    return _resample_matmul(x, src, method, x.shape[1], "bjk,bkwc->bjwc")


def resample_cols_matmul(x: jax.Array, src: jax.Array,
                         method: str = "linear") -> jax.Array:
    """As `resample_rows_matmul` but along axis 2."""
    return _resample_matmul(x, src, method, x.shape[2], "bjk,bhkc->bhjc")


def _resample_matmul(x, src, method, n, einsum_spec):
    k = jnp.arange(n, dtype=jnp.float32)
    if method == "nearest":
        idx = jnp.clip(jnp.round(src), 0, n - 1)
        m = (idx[..., None] == k).astype(x.dtype)
    else:
        d = jnp.abs(src[..., None] - k)
        m = jnp.maximum(0.0, 1.0 - d).astype(x.dtype)
        # renormalize edge rows (clipped support)
        m = m / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1e-6)
    return jnp.einsum(einsum_spec, m, x)


def base_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Identity coordinate field (H, W, 2) in (y, x) order."""
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    return jnp.stack([yy, xx], axis=-1)


# ----------------------------------------------------------------------------
# Coordinate-field builders. All take per-sample params (leading B axis) and
# return (B, H, W, 2) source coordinates for the output grid.
# ----------------------------------------------------------------------------


def rotation_coords(h: int, w: int, angles_deg: jax.Array) -> jax.Array:
    """Rotation about the image center (`A.Rotate(limit=15)`). Output pixel
    p maps to source R(-θ)·(p-c)+c."""
    g = base_grid(h, w)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = -angles_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(th), jnp.sin(th)
    dy = g[..., 0] - cy
    dx = g[..., 1] - cx

    def one(c, s):
        sy = cy + dy * c - dx * s
        sx = cx + dy * s + dx * c
        return jnp.stack([sy, sx], axis=-1)

    return jax.vmap(one)(cos, sin)


def perspective_coords(h: int, w: int, corner_jitter: jax.Array) -> jax.Array:
    """Random projective warp (`A.Perspective(scale=(0.05,0.1))`): the four
    source corners are jittered by `corner_jitter` (B, 4, 2) in (y, x) pixel
    units; the homography mapping output corners -> jittered source corners
    is fit per sample by an 8x8 DLT solve."""
    dst = jnp.asarray(
        [[0.0, 0.0], [0.0, w - 1.0], [h - 1.0, 0.0], [h - 1.0, w - 1.0]]
    )  # output corners (y, x)

    def solve_h(src):
        # Solve for H (3x3, h22=1) with src = H . dst in (x, y, 1) coords.
        rows = []
        rhs = []
        for k in range(4):
            X, Y = dst[k, 1], dst[k, 0]   # output (x, y)
            u, v = src[k, 1], src[k, 0]   # source (x, y)
            rows.append(jnp.stack(
                [X, Y, 1.0, 0 * X, 0 * X, 0 * X, -u * X, -u * Y]))
            rows.append(jnp.stack(
                [0 * X, 0 * X, 0 * X, X, Y, 1.0, -v * X, -v * Y]))
            rhs.extend([u, v])
        A = jnp.stack(rows)
        b = jnp.stack(rhs)
        sol = jnp.linalg.solve(A, b)
        return jnp.concatenate([sol, jnp.ones((1,))]).reshape(3, 3)

    src_corners = dst[None] + corner_jitter  # (B, 4, 2)
    H = jax.vmap(solve_h)(src_corners)  # (B, 3, 3)

    g = base_grid(h, w)
    ones = jnp.ones_like(g[..., :1])
    pts = jnp.concatenate([g[..., 1:2], g[..., 0:1], ones], axis=-1)  # x,y,1

    def apply_h(Hm):
        q = pts @ Hm.T
        return jnp.stack(
            [q[..., 1] / q[..., 2], q[..., 0] / q[..., 2]], axis=-1
        )

    return jax.vmap(apply_h)(H)


def optical_coords(h: int, w: int, k: jax.Array) -> jax.Array:
    """Barrel/pincushion radial distortion
    (`A.OpticalDistortion(distort_limit=0.3)`): source radius scales by
    (1 + k·r²)/(1 + k) with r normalized to the half-diagonal, keeping
    corners approximately fixed."""
    g = base_grid(h, w)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    dy = g[..., 0] - cy
    dx = g[..., 1] - cx
    r2 = (dy * dy + dx * dx) / ((cy * cy + cx * cx) + 1e-8)

    def one(kk):
        scale = (1.0 + kk * r2) / (1.0 + kk)
        return jnp.stack([cy + dy * scale, cx + dx * scale], axis=-1)

    return jax.vmap(one)(k)


def grid_distortion_coords(h: int, w: int, stretch_y: jax.Array,
                           stretch_x: jax.Array) -> jax.Array:
    """Separable piecewise-linear axis remap
    (`A.GridDistortion(num_steps=6, distort_limit=0.3)`). stretch_* are
    per-sample per-cell factors (B, steps) in [1-limit, 1+limit]; each axis
    gets a monotone map built from normalized cumulative cell widths."""

    def axis_map(stretch, n):
        # cell boundaries in source coords, normalized so the span is n-1
        widths = stretch / jnp.sum(stretch, axis=-1, keepdims=True)
        bounds = jnp.concatenate(
            [jnp.zeros_like(widths[:, :1]), jnp.cumsum(widths, axis=-1)],
            axis=-1,
        ) * (n - 1.0)  # (B, steps+1) source positions of uniform output knots
        steps = stretch.shape[-1]
        t = jnp.arange(n, dtype=jnp.float32) / (n - 1.0) * steps  # knot space
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, steps - 1)
        frac = t - i0
        lo = jnp.take_along_axis(bounds, i0[None, :].repeat(
            stretch.shape[0], 0), axis=1)
        hi = jnp.take_along_axis(bounds, (i0 + 1)[None, :].repeat(
            stretch.shape[0], 0), axis=1)
        return lo + (hi - lo) * frac  # (B, n)

    ys = axis_map(stretch_y, h)  # (B, H)
    xs = axis_map(stretch_x, w)  # (B, W)
    return jnp.stack(
        [jnp.broadcast_to(ys[:, :, None], (ys.shape[0], h, w)),
         jnp.broadcast_to(xs[:, None, :], (xs.shape[0], h, w))],
        axis=-1,
    )


def elastic_coords(h: int, w: int, key: jax.Array, batch: int,
                   alpha: float = 1.0, sigma: float = 25.0) -> jax.Array:
    """Elastic displacement (`A.ElasticTransform(alpha=1.0, sigma=25)`):
    random unit-normal field smoothed by a Gaussian of width sigma — realized
    as low-resolution noise at ~sigma px spacing upsampled bilinearly
    (equivalent smoothing, no full-res convolution), scaled by alpha px."""
    gh = max(2, int(round(h / sigma)))
    gw = max(2, int(round(w / sigma)))
    noise = jax.random.normal(key, (batch, gh, gw, 2)) * alpha
    disp = jax.image.resize(noise, (batch, h, w, 2), "linear")
    return base_grid(h, w)[None] + disp
