"""Per-op tests for the on-device augmentation suite.

Covers the op-for-op checklist vs the reference's albumentations pipelines
(`model_training/transforms.py:12-224`): every geometric and photometric op
gets an effect/identity/consistency check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.ops import augment as A
from s3od_tpu.ops import warp as W

KEY = jax.random.key(0)


def _imgs(b=4, s=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, s, s, 3)), jnp.float32)


def _structured(b=2, s=64):
    """Bright square on dark gradient, with matching mask."""
    x = np.tile(np.linspace(0.1, 0.3, s, dtype=np.float32)[None, :, None],
                (s, 1, 3))
    x = np.tile(x[None], (b, 1, 1, 1))
    m = np.zeros((b, s, s), np.float32)
    x[:, 16:48, 16:48] = 0.9
    m[:, 16:48, 16:48] = 1.0
    return jnp.asarray(x), jnp.asarray(m)


# ----------------------------------------------------------------------------
# warp primitives
# ----------------------------------------------------------------------------


def test_grid_sample_identity_exact():
    x = _imgs(1)[0]
    out = W.grid_sample(x, W.base_grid(64, 64), "linear")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out_n = W.grid_sample(x, W.base_grid(64, 64), "nearest")
    np.testing.assert_array_equal(np.asarray(out_n), np.asarray(x))


def test_grid_sample_reflect101_border():
    x = jnp.arange(5.0).reshape(1, 5, 1).repeat(5, axis=0)
    coords = W.base_grid(5, 5).at[..., 1].add(-2.0)  # shift left by 2
    out = W.grid_sample(x, coords, "nearest")[..., 0]
    # column 0 samples x=-2 -> reflect101 -> 2
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 2.0)
    np.testing.assert_array_equal(np.asarray(out[:, 1]), 1.0)
    np.testing.assert_array_equal(np.asarray(out[:, 2]), 0.0)


def test_rotation_matches_rot90():
    x = _imgs(1)[0]
    c = W.rotation_coords(64, 64, jnp.asarray([90.0]))
    r = np.asarray(W.grid_sample(x, c[0], "linear"))
    ref = np.asarray(jnp.rot90(x, 1, (0, 1)))
    # interior matches exactly; the border row hits fp-boundary blending
    np.testing.assert_allclose(r[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-4)


@pytest.mark.parametrize("builder", [
    lambda: W.perspective_coords(64, 64, jnp.zeros((1, 4, 2))),
    lambda: W.optical_coords(64, 64, jnp.zeros((1,))),
    lambda: W.grid_distortion_coords(64, 64, jnp.ones((1, 6)),
                                     jnp.ones((1, 6))),
    lambda: W.elastic_coords(64, 64, KEY, 1, alpha=0.0),
])
def test_distortions_identity_at_zero(builder):
    x = _imgs(1)[0]
    c = builder()
    out = W.grid_sample(x, c[0], "linear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("builder", [
    lambda: W.perspective_coords(
        64, 64, jax.random.normal(KEY, (2, 4, 2)) * 5.0),
    lambda: W.optical_coords(64, 64, jnp.asarray([0.3, -0.3])),
    lambda: W.grid_distortion_coords(
        64, 64, 1.0 + jax.random.uniform(KEY, (2, 6), minval=-0.3,
                                         maxval=0.3),
        1.0 + jax.random.uniform(KEY, (2, 6), minval=-0.3, maxval=0.3)),
    lambda: W.elastic_coords(64, 64, KEY, 2, alpha=8.0, sigma=16.0),
])
def test_distortions_move_pixels_and_masks_together(builder):
    """The image and its mask must warp with the same field."""
    x, m = _structured()
    c = builder()
    wx, wm = W.batched_warp(x, m, c)
    wx, wm = np.asarray(wx), np.asarray(wm)
    assert not np.allclose(wx, np.asarray(x))  # it actually distorts
    # bright pixels and mask still coincide
    bright = wx[..., 0] > 0.6
    mask = wm > 0.5
    iou = (bright & mask).sum() / max((bright | mask).sum(), 1)
    assert iou > 0.9


def test_geometric_warp_rotates_mask_with_image():
    x, m = _structured()
    wx, wm = A.geometric_warp(jax.random.key(1), x, m, "synthetic",
                              p_rotate=1.0, p_distort=0.0)
    wx, wm = np.asarray(wx), np.asarray(wm)
    bright = wx[..., 0] > 0.6
    mask = wm > 0.5
    iou = (bright & mask).sum() / max((bright | mask).sum(), 1)
    assert iou > 0.9
    assert not np.allclose(wx, np.asarray(x))


# ----------------------------------------------------------------------------
# photometric ops
# ----------------------------------------------------------------------------


ALL_PHOTOMETRIC = [
    ("color_jitter", lambda x: A.color_jitter(KEY, x)),
    ("hsv", lambda x: A.hue_saturation_value(KEY, x)),
    ("clahe", lambda x: A.clahe(x)),
    ("gauss_noise", lambda x: A.gauss_noise(KEY, x)),
    ("iso_noise", lambda x: A.iso_noise(KEY, x)),
    ("mult_noise", lambda x: A.multiplicative_noise(KEY, x)),
    ("jpeg", lambda x: A.jpeg_compression(KEY, x)),
    ("pixelate", lambda x: A.pixelate(KEY, x)),
    ("shadow", lambda x: A.random_shadow(KEY, x)),
    ("brightness_contrast", lambda x: A.random_brightness_contrast(KEY, x)),
    ("blur", lambda x: A.blur_one_of(KEY, x)),
    ("sepia", lambda x: A.to_sepia(x)),
    ("gray", lambda x: A.to_gray(x)),
    ("channel_shuffle", lambda x: A.channel_shuffle(KEY, x)),
    ("sharpen", lambda x: A.sharpen(KEY, x)),
    ("emboss", lambda x: A.emboss(KEY, x)),
    ("posterize", lambda x: A.posterize(x)),
    ("snow", lambda x: A.random_snow(KEY, x)),
    ("rain", lambda x: A.random_rain(KEY, x)),
]


@pytest.mark.parametrize("name,fn", ALL_PHOTOMETRIC,
                         ids=[n for n, _ in ALL_PHOTOMETRIC])
def test_photometric_shape_range_effect(name, fn):
    x = _imgs()
    y = fn(x)
    assert y.shape == x.shape
    assert float(y.min()) >= -1e-5 and float(y.max()) <= 1.0 + 1e-5
    assert not np.allclose(np.asarray(y), np.asarray(x)), name


def test_hsv_roundtrip():
    x = _imgs()
    back = A._hsv_to_rgb(A._rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_posterize_quantizes_to_32_levels():
    y = np.asarray(A.posterize(_imgs()))
    assert len(np.unique(np.round(y * 255).astype(int))) <= 32


def test_gray_channels_equal():
    y = np.asarray(A.to_gray(_imgs()))
    np.testing.assert_array_equal(y[..., 0], y[..., 1])
    np.testing.assert_array_equal(y[..., 1], y[..., 2])


def test_sepia_matches_matrix():
    x = _imgs()
    y = np.asarray(A.to_sepia(x))
    xn = np.asarray(x)
    man = np.clip(xn @ np.asarray(A._SEPIA).T, 0, 1)
    np.testing.assert_allclose(y, man, atol=1e-6)


def test_channel_shuffle_is_permutation():
    x = _imgs()
    y = np.asarray(A.channel_shuffle(KEY, x))
    xn = np.asarray(x)
    for i in range(x.shape[0]):
        cols_x = {tuple(np.round(xn[i, ..., c].ravel()[:50], 5))
                  for c in range(3)}
        cols_y = {tuple(np.round(y[i, ..., c].ravel()[:50], 5))
                  for c in range(3)}
        assert cols_x == cols_y


def test_jpeg_quality_ordering():
    """Lower quality must mean larger reconstruction error."""
    x = _imgs(2)
    lo = np.asarray(A.jpeg_compression(KEY, x, quality_range=(10, 10)))
    hi = np.asarray(A.jpeg_compression(KEY, x, quality_range=(90, 90)))
    xn = np.asarray(x)
    assert ((lo - xn) ** 2).mean() > ((hi - xn) ** 2).mean() * 2


def test_pixelate_produces_constant_blocks():
    x = _imgs(2)
    y = np.asarray(A.pixelate(KEY, x, scale_range=(0.5, 0.5)))
    np.testing.assert_array_equal(y[:, 0::2], y[:, 1::2])
    np.testing.assert_array_equal(y[:, :, 0::2], y[:, :, 1::2])


def test_shadow_only_darkens():
    x = _imgs()
    y = np.asarray(A.random_shadow(KEY, x))
    assert (y <= np.asarray(x) + 1e-6).all()
    assert (y < np.asarray(x) - 0.05).any()


def test_snow_only_brightens():
    x = _imgs() * 0.5
    y = np.asarray(A.random_snow(KEY, x))
    assert (y >= np.asarray(x) - 1e-6).all()
    assert (y > np.asarray(x) + 0.05).any()


def test_rain_darkens_scene_mean():
    x = _imgs()
    y = np.asarray(A.random_rain(KEY, x))
    assert y.mean() < np.asarray(x).mean()


def test_blur_smooths_noise():
    x = _imgs()
    y = np.asarray(A.blur_one_of(KEY, x, weights=(1.0, 0.0, 0.0, 0.0)))
    tv = lambda a: np.abs(np.diff(a, axis=1)).mean()
    assert tv(y) < tv(np.asarray(x)) * 0.8


def test_clahe_raises_contrast_of_flat_image():
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        0.5 + 0.02 * rng.standard_normal((2, 64, 64, 3)), jnp.float32
    )
    y = np.asarray(A.clahe(x))
    assert y.std() > np.asarray(x).std() * 1.5


@pytest.mark.slow
def test_synthetic_pipeline_batch_independent():
    """Per-sample parameters: different samples of a batch must receive
    different augmentations (checked via duplicated inputs)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    imgs = jnp.asarray(np.tile(img[None], (8, 1, 1, 1)))
    masks = jnp.zeros((8, 64, 64), jnp.float32)
    y, _ = A.augment_batch(jax.random.key(5), imgs, masks, "synthetic")
    y = np.asarray(y)
    diffs = [not np.allclose(y[i], y[j], atol=1e-3)
             for i in range(8) for j in range(i + 1, 8)]
    assert np.mean(diffs) > 0.8


@pytest.mark.slow
def test_synthetic_pipeline_jits():
    import functools

    fn = jax.jit(functools.partial(A.augment_batch, mode="synthetic"),
                 static_argnames=())
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                          dtype=np.uint8))
    masks = jnp.zeros((2, 64, 64), jnp.float32)
    y, m = fn(jax.random.key(0), imgs, masks)
    assert y.shape == imgs.shape and m.shape == masks.shape


# ----------------------------------------------------------------------------
# host-side geometric (cv2 path used by the training loader)
# ----------------------------------------------------------------------------


def test_host_geometric_mask_follows_image():
    import random as pyrandom

    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from s3od_tpu.training.data import host_geometric

    s = 128
    img = np.full((s, s, 3), 30, np.uint8)
    img[40:90, 40:90] = 220
    mask = np.zeros((s, s), np.float32)
    mask[40:90, 40:90] = 1.0

    rng = pyrandom.Random(0)
    changed = 0
    for trial in range(30):
        wi, wm = host_geometric(img, mask, rng, "synthetic",
                                p_rotate=0.5, p_distort=0.5)
        assert wi.shape == img.shape and wm.shape == mask.shape
        bright = wi[..., 0] > 128
        hard = wm > 0.5
        union = (bright | hard).sum()
        if union:
            iou = (bright & hard).sum() / union
            assert iou > 0.85, f"trial {trial}: mask diverged, IoU={iou:.3f}"
        if not np.array_equal(wi, img):
            changed += 1
    assert changed > 10  # the warps actually fire


def test_host_geometric_rotates_before_distortion(monkeypatch):
    """The reference applies Rotate (geometric block, transforms.py:31-42)
    BEFORE the synthetic distortion OneOf (:159-178), as does the device
    warp path — the host path must compose in the same order."""
    import random as pyrandom

    cv2 = pytest.importorskip("cv2")
    import s3od_tpu.training.data as data_mod

    calls = []
    real_affine, real_remap = cv2.warpAffine, cv2.remap
    real_persp = cv2.warpPerspective
    monkeypatch.setattr(cv2, "warpAffine", lambda *a, **k: (
        calls.append("rotate"), real_affine(*a, **k))[1])
    monkeypatch.setattr(cv2, "remap", lambda *a, **k: (
        calls.append("distort"), real_remap(*a, **k))[1])
    monkeypatch.setattr(cv2, "warpPerspective", lambda *a, **k: (
        calls.append("distort"), real_persp(*a, **k))[1])

    img = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8)
    mask = np.zeros((64, 64), np.float32)
    rng = pyrandom.Random(3)
    for _ in range(5):
        calls.clear()
        data_mod.host_geometric(img, mask, rng, "synthetic",
                                p_rotate=1.0, p_distort=1.0)
        assert calls[0] == "rotate" and "distort" in calls, calls


def test_host_geometric_noop_probabilities():
    import random as pyrandom

    pytest.importorskip("cv2")
    from s3od_tpu.training.data import host_geometric

    img = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8)
    mask = np.zeros((64, 64), np.float32)
    rng = pyrandom.Random(1)
    wi, wm = host_geometric(img, mask, rng, "regular",
                            p_rotate=0.0, p_distort=0.0)
    np.testing.assert_array_equal(wi, img)
