"""On-device batched augmentation pipeline.

The reference augments per-sample on CPU dataloader workers with
albumentations (`model_training/transforms.py:12-224`). TPU-native redesign:
the host does decode + geometric letterboxing (+ RandomResizedCrop) only;
everything else runs here as *batched, jitted* transforms fused into the
training step's input processing — zero host augment cost, one uint8
host->device transfer.

Complete op-for-op coverage of the reference's `regular` and `synthetic`
modes (see the checklist in `augment_batch`). Per-sample parameters come
from split PRNG keys so samples in a batch get independent augmentations;
OneOf blocks are realized as per-sample categorical picks with the
reference's normalized inner probabilities. All geometric ops (rotate +
optical/grid/elastic/perspective) share ONE bilinear gather via
`ops/warp.py`; masks ride along with nearest interpolation.

Known approximations (documented per op): CLAHE operates on luma with RGB
rescaling instead of LAB-L; JPEG uses 4:4:4 (no chroma subsampling); blur
convs zero-pad edges (the canvas border is zero padding anyway); hue shifts
rotate in YIQ. Each op keeps the reference's parameter ranges and
probabilities.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.ops import warp as W


def _u(key, batch, lo, hi, shape=()):
    return jax.random.uniform(key, (batch,) + shape, minval=lo, maxval=hi)


def _gate(key, batch, p):
    return jax.random.uniform(key, (batch,)) < p


def _apply_gated(x, y, gate):
    """Select per-sample between augmented y and original x."""
    g = gate.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(g, y, x)


def _one_of(key, batch, weights):
    """Per-sample categorical pick with albumentations OneOf normalization."""
    w = jnp.asarray(weights, jnp.float32)
    return jax.random.categorical(key, jnp.log(w / w.sum()), shape=(batch,))


def _pick(choice, idx, x, y):
    """Where choice==idx use y else x (per-sample)."""
    return _apply_gated(x, y, choice == idx)


# ----------------------------------------------------------------------------
# Geometric (image + mask)
# ----------------------------------------------------------------------------


def random_flips(key, images, masks, p_h=0.5, p_v=0.2, p_rot90=0.2):
    """Batched flips + rot90 (`transforms.py:32-34`), square canvas."""
    kh, kv, kr, kr2 = jax.random.split(key, 4)
    b = images.shape[0]

    gh = _gate(kh, b, p_h)
    images = _apply_gated(images, images[:, :, ::-1], gh)
    masks = _apply_gated(masks, masks[:, :, ::-1], gh)

    gv = _gate(kv, b, p_v)
    images = _apply_gated(images, images[:, ::-1], gv)
    masks = _apply_gated(masks, masks[:, ::-1], gv)

    gr = _gate(kr, b, p_rot90)
    k = jax.random.randint(kr2, (b,), 1, 4)
    rot_i = jnp.stack(
        [images, jnp.rot90(images, 1, (1, 2)), jnp.rot90(images, 2, (1, 2)),
         jnp.rot90(images, 3, (1, 2))], 1
    )
    rot_m = jnp.stack(
        [masks, jnp.rot90(masks, 1, (1, 2)), jnp.rot90(masks, 2, (1, 2)),
         jnp.rot90(masks, 3, (1, 2))], 1
    )
    sel_i = jnp.take_along_axis(
        rot_i, k[:, None, None, None, None], axis=1
    )[:, 0]
    sel_m = jnp.take_along_axis(rot_m, k[:, None, None, None], axis=1)[:, 0]
    images = _apply_gated(images, sel_i, gr)
    masks = _apply_gated(masks, sel_m, gr)
    return images, masks


def geometric_warp(key, images, masks, mode: str,
                   p_rotate=0.2, rotate_limit=15.0,
                   p_distort=0.4, distort_limit=0.3, grid_steps=6,
                   elastic_alpha=1.0, elastic_sigma=25.0,
                   perspective_scale=(0.05, 0.1)):
    """Rotate(±15°, p=0.2) (`transforms.py:41`) composed with the synthetic
    distortion OneOf (optical/grid/elastic/perspective, `:159-178`) as ONE
    gather: the distortion's source coordinates are rotated analytically, so
    out(p) = img(R(c_dist(p))) without a second image pass."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    keys = jax.random.split(key, 10)
    ident = jnp.broadcast_to(W.base_grid(h, w)[None], (b, h, w, 2))

    coords = ident
    if mode == "synthetic" and p_distort > 0:
        # OneOf inner probs 0.3/0.3/0.2/0.15 (`:159-178`), normalized.
        choice = _one_of(keys[0], b, [0.30, 0.30, 0.20, 0.15])
        gd = _gate(keys[1], b, p_distort)

        k_opt = _u(keys[2], b, -distort_limit, distort_limit)
        c_opt = W.optical_coords(h, w, k_opt)
        sy = 1.0 + _u(keys[3], b, -distort_limit, distort_limit,
                      (grid_steps,))
        sx = 1.0 + _u(keys[4], b, -distort_limit, distort_limit,
                      (grid_steps,))
        c_grid = W.grid_distortion_coords(h, w, sy, sx)
        c_el = W.elastic_coords(h, w, keys[5], b, elastic_alpha,
                                elastic_sigma)
        ps = _u(keys[6], b, perspective_scale[0], perspective_scale[1])
        jit4 = jax.random.normal(keys[7], (b, 4, 2)) * (
            ps[:, None, None] * jnp.asarray([h, w], jnp.float32)
        )
        c_persp = W.perspective_coords(h, w, jit4)

        coords = _pick(choice, 0, coords, c_opt)
        coords = _pick(choice, 1, coords, c_grid)
        coords = _pick(choice, 2, coords, c_el)
        coords = _pick(choice, 3, coords, c_persp)
        coords = _apply_gated(ident, coords, gd)

    if p_rotate > 0:
        gr = _gate(keys[8], b, p_rotate)
        ang = _u(keys[9], b, -rotate_limit, rotate_limit)
        ang = jnp.where(gr, ang, 0.0)
        # rotate the (possibly distorted) source coords about the center
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        th = -ang * jnp.pi / 180.0
        cos = jnp.cos(th).reshape(b, 1, 1)
        sin = jnp.sin(th).reshape(b, 1, 1)
        dy = coords[..., 0] - cy
        dx = coords[..., 1] - cx
        coords = jnp.stack(
            [cy + dy * cos - dx * sin, cx + dy * sin + dx * cos], axis=-1
        )

    return W.batched_warp(images, masks, coords)


# ----------------------------------------------------------------------------
# Color-space helpers; images float32 in [0, 1]
# ----------------------------------------------------------------------------


def _rgb_to_gray(x):
    return 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0,
        jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0),
    ) / 6.0
    s = d / (mx + 1e-12)
    return jnp.stack([h % 1.0, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    # Branchless formula (jnp.choose lowers to a pathological select chain
    # on TPU — 200+ ms at 1024x1024): f(n) = v - v*s*clip(min(k, 4-k), 0, 1)
    # with k = (n + 6h) mod 6.
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]

    def f(n):
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([f(5.0), f(3.0), f(1.0)], axis=-1)


def _rotate_hue_yiq(x, theta):
    """Cheap per-pixel-capable hue rotation in YIQ (theta broadcastable)."""
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    y = _rgb_to_gray(x)[..., 0]
    i = 0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2]
    q = 0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2]
    i2 = i * cos_t - q * sin_t
    q2 = i * sin_t + q * cos_t
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


# ----------------------------------------------------------------------------
# Photometric ops (image only)
# ----------------------------------------------------------------------------


def color_jitter(key, x, brightness=0.5, contrast=0.5, saturation=0.2,
                 hue=0.2):
    """`A.ColorJitter` (`transforms.py:46-52,66-73`): multiplicative
    brightness/contrast/saturation factors + hue rotation (YIQ approx of HSV
    hue shift)."""
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = _u(kb, b, 1 - brightness, 1 + brightness).reshape(b, 1, 1, 1)
    fc = _u(kc, b, 1 - contrast, 1 + contrast).reshape(b, 1, 1, 1)
    fs = _u(ks, b, 1 - saturation, 1 + saturation).reshape(b, 1, 1, 1)
    fh = _u(kh, b, -hue, hue).reshape(b, 1, 1)

    x = x * fb
    mean = jnp.mean(_rgb_to_gray(x), axis=(1, 2), keepdims=True)
    x = (x - mean) * fc + mean
    gray = _rgb_to_gray(x)
    x = (x - gray) * fs + gray
    return _rotate_hue_yiq(jnp.clip(x, 0.0, 1.0), fh * jnp.pi)


def hue_saturation_value(key, x, hue_shift=25.0, sat_shift=35.0,
                         val_shift=30.0):
    """`A.HueSaturationValue(25, 35, 30)` (`transforms.py:74-79`). Limits
    are OpenCV 8-bit HSV units: hue in [0,180) per turn, sat/val in [0,255].
    Real RGB<->HSV round-trip with additive shifts."""
    b = x.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    dh = _u(kh, b, -hue_shift, hue_shift).reshape(b, 1, 1) / 180.0
    ds = _u(ks, b, -sat_shift, sat_shift).reshape(b, 1, 1) / 255.0
    dv = _u(kv, b, -val_shift, val_shift).reshape(b, 1, 1) / 255.0
    hsv = _rgb_to_hsv(x)
    hsv = jnp.stack(
        [(hsv[..., 0] + dh) % 1.0,
         jnp.clip(hsv[..., 1] + ds, 0.0, 1.0),
         jnp.clip(hsv[..., 2] + dv, 0.0, 1.0)], axis=-1,
    )
    return _hsv_to_rgb(hsv)


def clahe(x, clip_limit=4.0, grid=8, bins=64):
    """`A.CLAHE(clip_limit=4.0, tile_grid_size=(8,8))` (`transforms.py:80-84`).

    Contrast-limited adaptive histogram equalization on luma (the reference
    path equalizes LAB-L; luma + RGB rescale is the TPU-friendly stand-in).
    TPU formulation: histograms AND per-pixel LUT application are one-hot
    matmuls on the MXU (64 luma bins, 2x2-subsampled histogram pixels) —
    point gathers/scatters measured ~200 ms for this op at 1024²; this form
    runs in single-digit ms. Bilinear mixing of the 4 neighboring tile LUTs
    uses half-tile-shifted interpolation regions so every region has fixed
    corner tiles."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    th, tw = h // grid, w // grid
    y = jnp.clip(_rgb_to_gray(x)[..., 0], 0.0, 1.0)
    q = jnp.clip((y * bins).astype(jnp.int32), 0, bins - 1)
    levels = jnp.arange(bins)

    # per-tile histograms (2x2-subsampled pixels, one-hot matmul reduce)
    qt = q.reshape(b, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    sub = qt[..., ::2, ::2].reshape(b, grid * grid, -1)
    oh = (sub[..., None] == levels).astype(jnp.bfloat16)
    hist = jnp.sum(oh, axis=2).astype(jnp.float32)  # (B, G*G, bins)
    npx = float(sub.shape[-1])
    clip = max(1.0, clip_limit * npx / bins)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / bins
    lut = (jnp.cumsum(hist, axis=-1) / npx).reshape(b, grid, grid, bins)

    # Interpolation regions: shift the grid by half a tile (edge-padded), so
    # each of the (G+1)² regions has the same 4 corner tiles everywhere.
    ph, pw = th // 2, tw // 2
    qp = jnp.pad(q, ((0, 0), (ph, th - ph), (pw, tw - pw)), mode="edge")
    qr = qp.reshape(b, grid + 1, th, grid + 1, tw).transpose(0, 1, 3, 2, 4)

    ai = jnp.arange(grid + 1)
    a0 = jnp.clip(ai - 1, 0, grid - 1)
    a1 = jnp.clip(ai, 0, grid - 1)
    l00 = lut[:, a0][:, :, a0]  # (B, G+1, G+1, bins)
    l01 = lut[:, a0][:, :, a1]
    l10 = lut[:, a1][:, :, a0]
    l11 = lut[:, a1][:, :, a1]

    wy = ((jnp.arange(th, dtype=jnp.float32) + 0.5) / th)[:, None]
    wx = ((jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw)[None, :]
    w00 = ((1 - wy) * (1 - wx)).reshape(-1)
    w01 = ((1 - wy) * wx).reshape(-1)
    w10 = (wy * (1 - wx)).reshape(-1)
    w11 = (wy * wx).reshape(-1)

    ohr = (
        qr.reshape(b, grid + 1, grid + 1, th * tw)[..., None] == levels
    ).astype(jnp.bfloat16)
    corners = jnp.stack([l00, l01, l10, l11], axis=-1).astype(jnp.bfloat16)
    vals = jnp.einsum("bijpk,bijkc->bijpc", ohr, corners).astype(jnp.float32)
    weights = jnp.stack([w00, w01, w10, w11], axis=-1)  # (P, 4)
    out = jnp.sum(vals * weights[None, None, None], axis=-1)

    out = out.reshape(b, grid + 1, grid + 1, th, tw).transpose(0, 1, 3, 2, 4)
    out = out.reshape(b, h + th, w + tw)[:, ph : ph + h, pw : pw + w]
    ratio = out / (y + 1e-6)
    return jnp.clip(x * ratio[..., None], 0.0, 1.0)


def gauss_noise(key, x, std_range=(0.2, 0.44)):
    """`A.GaussNoise(std_range=...)` (`transforms.py:59,94-97`); std_range is
    albumentations' [0,1]-scale std (visually calibrated by a 0.1 factor as
    in round 1)."""
    b = x.shape[0]
    ks, kn = jax.random.split(key)
    std = _u(ks, b, std_range[0], std_range[1]).reshape(b, 1, 1, 1) * 0.1
    return jnp.clip(x + std * jax.random.normal(kn, x.shape), 0.0, 1.0)


def iso_noise(key, x, color_shift=(0.01, 0.03), intensity=(0.08, 0.3)):
    """`A.ISONoise` (`transforms.py:60,89-93`): sensor-style noise = luma
    noise with Poisson-like sqrt(Y) scaling + per-pixel random hue drift
    proportional to color_shift (in turns)."""
    b = x.shape[0]
    ki, kc, kl, kh = jax.random.split(key, 4)
    inten = _u(ki, b, intensity[0], intensity[1]).reshape(b, 1, 1, 1)
    cshift = _u(kc, b, color_shift[0], color_shift[1]).reshape(b, 1, 1)
    y = _rgb_to_gray(x)
    lum_noise = jax.random.normal(kl, y.shape) * jnp.sqrt(
        jnp.clip(y, 0.0, 1.0)
    )
    x = jnp.clip(x + inten * lum_noise, 0.0, 1.0)
    theta = jax.random.normal(kh, x.shape[:3]) * cshift * (2 * jnp.pi)
    return _rotate_hue_yiq(x, theta)


def multiplicative_noise(key, x, mult=(0.9, 1.1)):
    """`A.MultiplicativeNoise(multiplier=(0.9,1.1))` (`transforms.py:61,98-101`)."""
    f = jax.random.uniform(
        key, (x.shape[0], 1, 1, 1), minval=mult[0], maxval=mult[1]
    )
    return jnp.clip(x * f, 0.0, 1.0)


# --- JPEG compression via blockwise DCT -------------------------------------

_JPEG_Q_LUMA = np.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

_JPEG_Q_CHROMA = np.asarray([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


@functools.lru_cache(maxsize=1)
def _dct8_np():
    # cached as numpy — a cached jnp array would leak tracers across jits
    import numpy as np

    c = np.zeros((8, 8), np.float32)
    for k in range(8):
        for n in range(8):
            c[k, n] = math.cos(math.pi * (2 * n + 1) * k / 16.0)
    c *= math.sqrt(2.0 / 8.0)
    c[0] /= math.sqrt(2.0)
    return c


def _dct8():
    return jnp.asarray(_dct8_np())


def jpeg_compression(key, x, quality_range=(30, 80)):
    """`A.ImageCompression(quality_range=(30,80))` (`transforms.py:106-109`):
    real JPEG luma/chroma quantization in the 8x8 DCT domain as MXU matmuls
    (4:4:4 — no chroma subsampling — is the one simplification)."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    q = _u(key, b, quality_range[0], quality_range[1])
    scale = jnp.where(q < 50, 5000.0 / q, 200.0 - 2.0 * q)
    qt_l = jnp.clip(
        jnp.floor((_JPEG_Q_LUMA[None] * scale[:, None, None] + 50) / 100),
        1, 255)
    qt_c = jnp.clip(
        jnp.floor((_JPEG_Q_CHROMA[None] * scale[:, None, None] + 50) / 100),
        1, 255)

    r, g, bl = x[..., 0], x[..., 1], x[..., 2]
    y = (0.299 * r + 0.587 * g + 0.114 * bl) * 255.0 - 128.0
    cb = (-0.168736 * r - 0.331264 * g + 0.5 * bl) * 255.0
    cr = (0.5 * r - 0.418688 * g - 0.081312 * bl) * 255.0

    C = _dct8()

    def codec(chan, qt):
        blocks = chan.reshape(b, h // 8, 8, w // 8, 8)
        f = jnp.einsum("ki,bhiwj,lj->bhkwl", C, blocks, C)
        f = jnp.round(f / qt[:, None, :, None, :]) * qt[:, None, :, None, :]
        out = jnp.einsum("ik,bhkwl,jl->bhiwj", C, f, C)
        return out.reshape(b, h, w)

    y = codec(y, qt_l) + 128.0
    cb = codec(cb, qt_c)
    cr = codec(cr, qt_c)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, bl], axis=-1) / 255.0, 0.0, 1.0)


def pixelate(key, x, scale_range=(0.4, 0.7)):
    """`A.Downscale(scale_range=(0.4,0.7))` (`transforms.py:110-113`):
    nearest down+up (the albumentations default) == sampling at quantized
    coordinates. Axis-separable with per-sample scales -> two matmul
    resamples (no dynamic shapes, no point gathers)."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    s = _u(key, b, scale_range[0], scale_range[1])
    ys = jnp.arange(h, dtype=jnp.float32)[None] * s[:, None]
    ys = jnp.floor(ys) / s[:, None] + 0.5 / s[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None] * s[:, None]
    xs = jnp.floor(xs) / s[:, None] + 0.5 / s[:, None]
    out = W.resample_rows_matmul(x, ys, "nearest")
    return W.resample_cols_matmul(out, xs, "nearest")


def random_shadow(key, x, num_range=(1, 3), roi=(0.0, 0.1, 1.0, 1.0),
                  darkness=0.5):
    """`A.RandomShadow(shadow_roi=(0,0.1,1,1), num_shadows_limit=(1,3))`
    (`transforms.py:118-122`): up to 3 soft rotated-rectangle shadows with
    centers in the ROI, each multiplying luminance by ~darkness."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    kn, kc, ka, ks = jax.random.split(key, 4)
    n_max = num_range[1]
    n = jax.random.randint(kn, (b,), num_range[0], num_range[1] + 1)
    cy = _u(jax.random.fold_in(kc, 0), b, roi[1] * h, roi[3] * h, (n_max,))
    cx = _u(jax.random.fold_in(kc, 1), b, roi[0] * w, roi[2] * w, (n_max,))
    ang = _u(ka, b, 0.0, jnp.pi, (n_max,))
    hh = _u(jax.random.fold_in(ks, 0), b, 0.08 * h, 0.35 * h, (n_max,))
    ww = _u(jax.random.fold_in(ks, 1), b, 0.08 * w, 0.35 * w, (n_max,))

    g = W.base_grid(h, w)  # (H, W, 2)
    yy = g[..., 0][None, None]  # (1,1,H,W)
    xx = g[..., 1][None, None]
    dy = yy - cy[..., None, None]
    dx = xx - cx[..., None, None]
    ca = jnp.cos(ang)[..., None, None]
    sa = jnp.sin(ang)[..., None, None]
    u = dy * ca - dx * sa
    v = dy * sa + dx * ca
    soft = 4.0  # px edge softness
    inside = (
        jax.nn.sigmoid((hh[..., None, None] - jnp.abs(u)) / soft)
        * jax.nn.sigmoid((ww[..., None, None] - jnp.abs(v)) / soft)
    )  # (B, n_max, H, W)
    active = (jnp.arange(n_max)[None] < n[:, None]).astype(x.dtype)
    shade = 1.0 - (1.0 - darkness) * jnp.clip(
        jnp.sum(inside * active[..., None, None], axis=1), 0.0, 1.0
    )
    return x * shade[..., None]


def random_brightness_contrast(key, x, brightness=0.4, contrast=0.4):
    """`A.RandomBrightnessContrast(0.4, 0.4)` (`transforms.py:123-127`):
    x*(1+contrast) + brightness (brightness_by_max)."""
    b = x.shape[0]
    kb, kc = jax.random.split(key)
    alpha = 1.0 + _u(kc, b, -contrast, contrast).reshape(b, 1, 1, 1)
    beta = _u(kb, b, -brightness, brightness).reshape(b, 1, 1, 1)
    return jnp.clip(x * alpha + beta, 0.0, 1.0)


# --- Blur family: one per-sample 13x13 kernel, one depthwise conv -----------

_BLUR_K = 13  # holds defocus radius 6, motion length 7, gaussian k<=7


def _blur_grid():
    r = _BLUR_K // 2
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    return jnp.meshgrid(d, d, indexing="ij")  # (dy, dx)


def _gaussian_kernel(ksize):
    """cv2.GaussianBlur sigma convention: 0.3*((k-1)/2 - 1) + 0.8."""
    dy, dx = _blur_grid()
    sigma = 0.3 * ((ksize - 1.0) * 0.5 - 1.0) + 0.8
    k = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma * sigma))
    r2 = (ksize / 2.0) ** 2
    k = k * ((dy * dy + dx * dx) <= r2 + 1e-6)
    return k / jnp.sum(k)


def _motion_kernel(angle, length):
    """Line segment of `length` px at `angle` through the center
    (`A.MotionBlur(blur_limit=(3,7))`)."""
    dy, dx = _blur_grid()
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    along = dy * sa + dx * ca
    perp = dy * ca - dx * sa
    k = (jnp.abs(perp) <= 0.5) & (jnp.abs(along) <= length / 2.0)
    k = k.astype(jnp.float32)
    return k / jnp.maximum(jnp.sum(k), 1.0)


def _defocus_kernel(radius, alias):
    """Disk of `radius` with soft (alias-blurred) edge
    (`A.Defocus(radius=(2,6), alias_blur=(0.1,0.3))`)."""
    dy, dx = _blur_grid()
    d = jnp.sqrt(dy * dy + dx * dx)
    k = jax.nn.sigmoid((radius - d) / jnp.maximum(alias * 2.0, 0.05))
    return k / jnp.sum(k)


def blur_one_of(key, x, weights=(0.4, 0.4, 0.3, 0.2)):
    """Blur OneOf (`transforms.py:130-149`): MotionBlur / GaussianBlur /
    Defocus / ZoomBlur with the reference's inner probabilities. The three
    kernel blurs build ONE per-sample 13x13 kernel and share one depthwise
    conv; ZoomBlur averages 3 radial zoom taps via grid sampling."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    keys = jax.random.split(key, 6)
    choice = _one_of(keys[0], b, list(weights))

    # per-sample kernels
    gk = _u(keys[1], b, 3.0, 7.0)
    kg = jax.vmap(_gaussian_kernel)(gk)
    ma = _u(jax.random.fold_in(keys[2], 0), b, 0.0, jnp.pi)
    ml = _u(jax.random.fold_in(keys[2], 1), b, 3.0, 7.0)
    km = jax.vmap(_motion_kernel)(ma, ml)
    dr = _u(jax.random.fold_in(keys[3], 0), b, 2.0, 6.0)
    da = _u(jax.random.fold_in(keys[3], 1), b, 0.1, 0.3)
    kd = jax.vmap(_defocus_kernel)(dr, da)

    kern = jnp.where((choice == 0).reshape(b, 1, 1), km,
                     jnp.where((choice == 1).reshape(b, 1, 1), kg, kd))
    pad = _BLUR_K // 2

    # ONE depthwise conv for the whole batch: fold batch into channels
    # (B,H,W,3) -> (1,H,W,B*3) with per-sample kernels as groups. A vmapped
    # per-sample conv lowered ~60x slower on v5e.
    folded = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * 3)
    kk = jnp.repeat(
        kern.transpose(1, 2, 0), 3, axis=-1
    ).reshape(_BLUR_K, _BLUR_K, 1, b * 3)
    blurred = jax.lax.conv_general_dilated(
        folded, kk, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * 3,
    )[0].reshape(h, w, b, 3).transpose(2, 0, 1, 3)

    # ZoomBlur (max_factor=1.03): mean over zoom taps 1.0/1.015/1.03.
    # Zoom is axis-separable per sample -> matmul resamples on the MXU.
    zf = _u(keys[4], b, 1.0, 1.03)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    acc = x
    for t in (0.5, 1.0):
        s = (1.0 / (1.0 + (zf - 1.0) * t))[:, None]
        src_y = cy + (ys[None] - cy) * s
        src_x = cx + (xs[None] - cx) * s
        z = W.resample_rows_matmul(x, src_y, "linear")
        acc = acc + W.resample_cols_matmul(z, src_x, "linear")
    zoomed = acc / 3.0
    return _pick(choice, 3, blurred, zoomed)


# --- Color-space swaps -------------------------------------------------------

_SEPIA = np.asarray([
    [0.393, 0.769, 0.189],
    [0.349, 0.686, 0.168],
    [0.272, 0.534, 0.131]], np.float32)


def to_sepia(x):
    """`A.ToSepia` (`transforms.py:153`)."""
    return jnp.clip(jnp.einsum("bhwc,dc->bhwd", x, _SEPIA), 0.0, 1.0)


def to_gray(x):
    return jnp.broadcast_to(_rgb_to_gray(x), x.shape)


def channel_shuffle(key, x):
    """Per-sample random channel permutation (`A.ChannelShuffle`)."""
    b = x.shape[0]
    perms = jax.vmap(lambda k: jax.random.permutation(k, 3))(
        jax.random.split(key, b)
    )
    return jax.vmap(lambda img, p: img[..., p])(x, perms)


# --- Sharpen / Emboss / Posterize -------------------------------------------


def _shift(x, dy, dx):
    return jnp.roll(x, (dy, dx), axis=(1, 2))


def sharpen(key, x, alpha=(0.2, 0.5), lightness=(0.5, 1.0)):
    """`A.Sharpen(alpha, lightness)` (`transforms.py:53,187-190`):
    out = (1-a)*img + a*conv(img, [[-1..],[-1, 8+l, -1],[..-1]]), computed as
    (9+l)*img - boxsum3(img) without materializing kernels."""
    b = x.shape[0]
    ka, kl = jax.random.split(key)
    a = _u(ka, b, alpha[0], alpha[1]).reshape(b, 1, 1, 1)
    l = _u(kl, b, lightness[0], lightness[1]).reshape(b, 1, 1, 1)
    box = sum(
        _shift(x, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    )
    eff = (9.0 + l) * x - box
    return jnp.clip((1 - a) * x + a * eff, 0.0, 1.0)


def emboss(key, x, alpha=(0.2, 0.4), strength=(0.2, 0.5)):
    """`A.Emboss(alpha, strength)` (`transforms.py:182-186`): diagonal
    relief kernel [[-1-s,-s,0],[-s,1,s],[0,s,1+s]] blended by alpha."""
    b = x.shape[0]
    ka, ks = jax.random.split(key)
    a = _u(ka, b, alpha[0], alpha[1]).reshape(b, 1, 1, 1)
    s = _u(ks, b, strength[0], strength[1]).reshape(b, 1, 1, 1)
    diag = _shift(x, 1, 1) - _shift(x, -1, -1)
    cross = (_shift(x, 1, 0) + _shift(x, 0, 1)
             - _shift(x, -1, 0) - _shift(x, 0, -1))
    eff = x + diag + s * (diag + cross)
    return jnp.clip((1 - a) * x + a * eff, 0.0, 1.0)


def posterize(x, num_bits=5):
    """`A.Posterize(num_bits=5)` (`transforms.py:191-194`): keep the top
    `num_bits` of the 8-bit value."""
    q = float(1 << (8 - num_bits))
    return jnp.floor(x * 255.0 / q) * q / 255.0


# --- Weather -----------------------------------------------------------------


def random_snow(key, x, snow_point=(0.1, 0.3), brightness_coeff=2.5):
    """`A.RandomSnow(method="bleach")` (`transforms.py:200-205`): lightness
    below snow_point threshold gets multiplied by brightness_coeff (blown
    highlights read as snow)."""
    b = x.shape[0]
    sp = _u(key, b, snow_point[0], snow_point[1]).reshape(b, 1, 1)
    thr = 85.0 / 255.0 + sp * 0.5  # cv2-scale threshold mapping
    y = _rgb_to_gray(x)[..., 0]
    factor = jnp.where(y < thr, brightness_coeff, 1.0)
    return jnp.clip(x * factor[..., None], 0.0, 1.0)


def random_rain(key, x, slant=(-10.0, 10.0), drop_length=20, drop_width=1,
                drop_color=(200, 200, 200), blur_k=7,
                brightness_coefficient=0.7):
    """`A.RandomRain` (`transforms.py:206-215`): sparse drop seeds convolved
    with an oriented line kernel make streaks; composite the drop color,
    blur the streak field, and darken the scene by brightness_coefficient."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    kseed, ks = jax.random.split(key)
    density = 1.0 / 600.0  # ~area/600 drops like the reference default
    seeds = (jax.random.uniform(kseed, (b, h, w)) < density).astype(
        jnp.float32
    )

    # Slanted streaks: per-sample slant quantized to 5 static values so the
    # line "convolution" becomes log-depth static shift-adds (a 1-channel
    # 20x21 line conv measured ~25 ms on v5e; this is <1 ms). Each doubling
    # step extends the streak: len 1 -> 2 -> 4 -> 8 -> 16 -> 20.
    L = drop_length
    slant_levels = (-10.0, -5.0, 0.0, 5.0, 10.0)
    pick = jax.random.randint(ks, (b,), 0, len(slant_levels))

    def streak_static(s_px):
        acc = seeds
        grown = 1
        parts = [(1, acc)]
        while grown < 16:
            dx = int(round(grown * s_px / L))
            acc = acc + jnp.roll(acc, (grown, dx), axis=(1, 2))
            grown *= 2
            parts.append((grown, acc))
        # 16 + 4 = 20
        four = parts[2][1]
        dx16 = int(round(16 * s_px / L))
        return acc + jnp.roll(four, (16, dx16), axis=(1, 2))

    streaks = streak_static(slant_levels[0])
    for i, s_px in enumerate(slant_levels[1:], start=1):
        streaks = _pick(pick, i, streaks, streak_static(s_px))
    streaks = jnp.clip(streaks, 0.0, 1.0)
    # soften streaks (stand-in for the cv2 blur=7 pass)
    streaks = jax.image.resize(
        jax.image.resize(streaks, (b, h // 4, w // 4), "linear"),
        (b, h, w), "linear",
    ) * 0.7
    color = jnp.asarray(drop_color, jnp.float32) / 255.0
    out = x * brightness_coefficient
    return out * (1 - streaks[..., None]) + color * streaks[..., None]


# ----------------------------------------------------------------------------
# Composed pipelines
# ----------------------------------------------------------------------------


def augment_batch(
    key: jax.Array,
    images_u8: jax.Array,
    masks: jax.Array,
    mode: str = "regular",
    device_geometric: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Full batched augmentation. images uint8 (B,S,S,3), masks float (B,S,S).

    Returns (images float32 [0,1], masks). Modes: test | regular | synthetic.

    Op-for-op checklist vs `model_training/transforms.py`:

    geometric (regular + synthetic, `:31-42`):
      HorizontalFlip p=.5 / VerticalFlip p=.2 / RandomRotate90 p=.2 [here],
      RandomResizedCrop p=.5 [host, training/data.py], Rotate ±15° p=.2 [here]
    regular color OneOf p=.5 (`:44-55`): ColorJitter(.5,.5,.2,.2) w=.7 |
      Sharpen(.2-.5,.5-1.) w=.3
    regular noise OneOf p=.3 (`:57-63`): GaussNoise(.2-.44) | ISONoise |
      MultiplicativeNoise(.9-1.1), equal weights
    synthetic (`:65-217`):
      1. color OneOf p=.7: ColorJitter(.4,.4,.3,.2) w=.7 | HSV(25,35,30)
         w=.4 | CLAHE(4.0, 8x8) w=.2
      2. noise OneOf p=.6: ISONoise(.01-.03,.08-.3) | GaussNoise(.25-.6) |
         MultiplicativeNoise(.9-1.1), w=.4 each
      3. quality OneOf p=.5: ImageCompression(q30-80) w=.4 | Downscale
         (.4-.7) w=.3
      4. lighting OneOf p=.5: RandomShadow(1-3) w=.4 |
         RandomBrightnessContrast(.4,.4) w=.4
      5. blur OneOf p=.5: MotionBlur(3-7) w=.4 | GaussianBlur(3-7) w=.4 |
         Defocus(2-6,.1-.3) w=.3 | ZoomBlur(1.03) w=.2
      6. colorspace OneOf p=.05: ToSepia w=.5 | ToGray w=.5 |
         ChannelShuffle w=.3
      7. distortion OneOf p=.4 [fused into the geometric warp]:
         OpticalDistortion(.3) w=.3 | GridDistortion(6,.3) w=.3 |
         ElasticTransform(1,25) w=.2 | Perspective(.05-.1) w=.15
      8. relief OneOf p=.3: Emboss(.2-.4,.2-.5) w=.3 | Sharpen(.2-.6,.5-1.2)
         w=.3 | Posterize(5) w=.2
      9. weather OneOf p=.15: RandomSnow w=.1 | RandomRain w=.1
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if mode == "test":
        return x, masks

    keys = jax.random.split(key, 24)
    b = x.shape[0]

    x, masks = random_flips(keys[0], x, masks)
    if device_geometric:
        # Rotation + distortion warps. On real training runs the host loader
        # applies these with cv2 instead (`training/data.py:host_geometric`,
        # `device_geometric=False`): a full-image point gather measured
        # ~190 ms/batch at 1024² on v5e, while cv2.remap hides behind the
        # prefetch pipeline. This device path keeps CPU tests and
        # loader-free callers (transforms facade) self-contained.
        x, masks = geometric_warp(
            keys[1], x, masks, mode,
            p_distort=0.4 if mode == "synthetic" else 0.0,
        )

    if mode == "regular":
        # color OneOf p=.5: ColorJitter w=.7 | Sharpen w=.3
        g = _gate(keys[2], b, 0.5)
        pick = _one_of(keys[3], b, [0.7, 0.3])
        colored = _pick(pick, 0, x, color_jitter(keys[4], x))
        colored = _pick(pick, 1, colored,
                        sharpen(keys[5], x, (0.2, 0.5), (0.5, 1.0)))
        x = _apply_gated(x, colored, g)

        # noise OneOf p=.3: Gauss | ISO | Multiplicative
        g = _gate(keys[6], b, 0.3)
        pick = _one_of(keys[7], b, [1.0, 1.0, 1.0])
        noised = _pick(pick, 0, x, gauss_noise(keys[8], x, (0.2, 0.44)))
        noised = _pick(pick, 1, noised, iso_noise(keys[9], x))
        noised = _pick(pick, 2, noised, multiplicative_noise(keys[10], x))
        x = _apply_gated(x, noised, g)
        return x, masks

    # synthetic mode -------------------------------------------------------
    # CLAHE tiles and JPEG blocks need 8-divisible canvases (every training
    # size is); fall back to their nearest sibling op otherwise.
    div8 = x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0

    # 1. color
    g = _gate(keys[2], b, 0.7)
    pick = _one_of(keys[3], b, [0.7, 0.4, 0.2])
    y = _pick(pick, 0, x, color_jitter(keys[4], x, 0.4, 0.4, 0.3, 0.2))
    y = _pick(pick, 1, y, hue_saturation_value(keys[5], x))
    y = _pick(pick, 2, y, clahe(x) if div8 else hue_saturation_value(
        keys[5], x))
    x = _apply_gated(x, y, g)

    # 2. noise
    g = _gate(keys[6], b, 0.6)
    pick = _one_of(keys[7], b, [0.4, 0.4, 0.4])
    y = _pick(pick, 0, x, iso_noise(keys[8], x))
    y = _pick(pick, 1, y, gauss_noise(keys[9], x, (0.25, 0.6)))
    y = _pick(pick, 2, y, multiplicative_noise(keys[10], x))
    x = _apply_gated(x, y, g)

    # 3. quality degradation
    g = _gate(keys[11], b, 0.5)
    pick = _one_of(keys[12], b, [0.4, 0.3])
    y = _pick(pick, 0, x,
              jpeg_compression(keys[13], x) if div8 else pixelate(keys[14], x))
    y = _pick(pick, 1, y, pixelate(keys[14], x))
    x = _apply_gated(x, y, g)

    # 4. lighting
    g = _gate(keys[15], b, 0.5)
    pick = _one_of(keys[16], b, [0.4, 0.4])
    y = _pick(pick, 0, x, random_shadow(keys[17], x))
    y = _pick(pick, 1, y, random_brightness_contrast(keys[18], x))
    x = _apply_gated(x, y, g)

    # 5. blur
    g = _gate(keys[19], b, 0.5)
    x = _apply_gated(x, blur_one_of(keys[20], x), g)

    # 6. colorspace swap (rare)
    g = _gate(keys[21], b, 0.05)
    kpick, kshuf = jax.random.split(keys[22])
    pick = _one_of(kpick, b, [0.5, 0.5, 0.3])
    y = _pick(pick, 0, x, to_sepia(x))
    y = _pick(pick, 1, y, to_gray(x))
    y = _pick(pick, 2, y, channel_shuffle(kshuf, x))
    x = _apply_gated(x, y, g)

    # 8./9. relief + weather (7. distortion already fused in the warp)
    sub = jax.random.split(keys[23], 8)
    g = _gate(sub[0], b, 0.3)
    pick = _one_of(sub[1], b, [0.3, 0.3, 0.2])
    y = _pick(pick, 0, x, emboss(sub[2], x))
    y = _pick(pick, 1, y, sharpen(sub[3], x, (0.2, 0.6), (0.5, 1.2)))
    y = _pick(pick, 2, y, posterize(x))
    x = _apply_gated(x, y, g)

    g = _gate(sub[4], b, 0.15)
    pick = _one_of(sub[5], b, [0.5, 0.5])
    y = _pick(pick, 0, x, random_snow(sub[6], x))
    y = _pick(pick, 1, y, random_rain(sub[7], x))
    x = _apply_gated(x, y, g)

    return x, masks


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """[0,1] float -> ImageNet-normalized."""
    mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
    return (x - mean) / std
