"""API-contract tests for the inference package.

Ports the reference test surface (`tests/test_inference_package.py` in the
reference: RemovalResult structure, shape preservation across aspect ratios,
N masks == N ious) using a deterministic tiny model — the fake-model path the
reference lacks (SURVEY.md §4).
"""

import numpy as np
import pytest
from PIL import Image

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params
from s3od_tpu.predictor import BackgroundRemoval, RemovalResult


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    return BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )


def test_removal_result_structure(predictor, circle_image):
    img, _ = circle_image
    result = predictor.remove_background(img)
    assert isinstance(result, RemovalResult)
    assert result.predicted_mask.shape == img.shape[:2]
    assert result.all_masks.shape == (3,) + img.shape[:2]
    assert result.all_ious.shape == (3,)
    assert result.rgba_image.mode == "RGBA"
    assert result.rgba_image.size == (img.shape[1], img.shape[0])
    assert result.predicted_mask.min() >= 0.0
    assert result.predicted_mask.max() <= 1.0


def test_bad_model_id_raises():
    with pytest.raises(ValueError):
        BackgroundRemoval(model_id="/nonexistent/path/to/model.pt")


def test_numpy_and_pil_parity(predictor, circle_image):
    img, _ = circle_image
    r_np = predictor.remove_background(img)
    r_pil = predictor.remove_background(Image.fromarray(img))
    np.testing.assert_allclose(r_np.predicted_mask, r_pil.predicted_mask, atol=1e-6)


@pytest.mark.parametrize(
    "shape",
    # includes aspect ratios producing ODD letterbox padding (the reference
    # crashes on those: `src/s3od/predictor.py:85-87`)
    [(100, 100), (900, 900), (200, 400), (400, 200), (255, 512), (512, 255)],
)
def test_shape_preservation(predictor, shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=shape + (3,), dtype=np.uint8)
    result = predictor.remove_background(img)
    assert result.predicted_mask.shape == shape
    assert result.rgba_image.size == (shape[1], shape[0])


def test_num_masks_matches_num_ious(predictor, circle_image):
    img, _ = circle_image
    result = predictor.remove_background(img)
    assert len(result.all_masks) == len(result.all_ious) == 3


def test_predicted_is_argmax_iou(predictor, circle_image):
    img, _ = circle_image
    result = predictor.remove_background(img)
    best = int(result.all_ious.argmax())
    np.testing.assert_array_equal(result.predicted_mask, result.all_masks[best])


def test_alpha_matches_mask(predictor, circle_image):
    img, _ = circle_image
    result = predictor.remove_background(img)
    alpha = np.asarray(result.rgba_image)[..., 3]
    np.testing.assert_array_equal(
        alpha, (result.predicted_mask * 255).astype(np.uint8)
    )


def test_batch_matches_single(predictor, circle_image):
    img, _ = circle_image
    rng = np.random.default_rng(3)
    img2 = rng.integers(0, 255, size=(160, 120, 3), dtype=np.uint8)
    batch = predictor.remove_background_batch([img, img2])
    singles = [predictor.remove_background(img), predictor.remove_background(img2)]
    for b, s in zip(batch, singles):
        np.testing.assert_allclose(b.predicted_mask, s.predicted_mask, atol=1e-5)


def test_batch_chunking_matches_single(predictor, circle_image):
    """Chunked batching (predictor.py remove_background_batch): a list
    longer than `chunk` splits into full chunks + a padded power-of-2 tail
    bucket; every image's result must match its single-image prediction."""
    img, _ = circle_image
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 255, size=(100 + 7 * i, 90 + 5 * i, 3), dtype=np.uint8)
        for i in range(5)
    ]
    # chunk=2 -> chunks [2, 2, 1(tail bucket 1)]; exercises full-chunk reuse
    # AND the padded-tail path.
    batch = predictor.remove_background_batch(imgs, chunk=2)
    assert len(batch) == 5
    for im, b in zip(imgs, batch):
        s = predictor.remove_background(im)
        np.testing.assert_allclose(b.predicted_mask, s.predicted_mask, atol=1e-5)
        np.testing.assert_allclose(b.all_ious, s.all_ious, atol=1e-5)


@pytest.mark.slow
def test_data_parallel_batch_non_divisible(circle_image):
    """A sharded predictor must handle list lengths not divisible by the
    mesh (tail bucket rounds up to mesh divisibility and pads)."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    dp = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32", data_parallel=True
    )
    assert dp._mesh is not None and dp._mesh.size > 1
    img, _ = circle_image
    imgs = [img] * (dp._mesh.size + 3)
    results = dp.remove_background_batch(imgs)
    assert len(results) == dp._mesh.size + 3
    single = dp.remove_background(img)
    for r in results:
        np.testing.assert_allclose(r.predicted_mask, single.predicted_mask, atol=1e-5)


def test_visualizers(predictor, circle_image):
    from s3od_tpu.visualizer import visualize_all_masks, visualize_removal

    img, _ = circle_image
    result = predictor.remove_background(img)
    comp = visualize_removal(img, result)
    assert comp.size == (img.shape[1], img.shape[0])
    grid = visualize_all_masks(img, result)
    assert grid.size == (img.shape[1] * 3, img.shape[0])


def test_native_checkpoint_roundtrip(tmp_path, predictor, circle_image):
    from s3od_tpu.convert import load_native, save_native

    img, _ = circle_image
    path = str(tmp_path / "model.npz")
    save_native(path, predictor.params, predictor.state)
    params2, state2 = load_native(path)
    p2 = BackgroundRemoval.from_params(
        params2, state2, predictor.cfg, image_size=128, dtype="float32"
    )
    r1 = predictor.remove_background(img)
    r2 = p2.remove_background(img)
    np.testing.assert_allclose(r1.predicted_mask, r2.predicted_mask, atol=1e-6)


@pytest.mark.slow
def test_data_parallel_batch(circle_image):
    """Sharded batched inference over the virtual multi-device mesh."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    dp = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32", data_parallel=True
    )
    assert dp._mesh is not None and dp._mesh.size > 1
    img, _ = circle_image
    imgs = [img] * dp._mesh.size
    results = dp.remove_background_batch(imgs)
    single = dp.remove_background(img)
    for r in results:
        np.testing.assert_allclose(r.predicted_mask, single.predicted_mask, atol=1e-5)


def test_pathological_inputs(predictor):
    """Input normalization (predictor.py _as_rgb_uint8 + utils.get_pad_info
    min-side clamp): extreme aspect ratios, grayscale, RGBA and float
    images must all produce a mask of the original spatial shape."""
    rng = np.random.default_rng(0)
    cases = {
        "1x1": rng.integers(0, 255, (1, 1, 3), dtype=np.uint8),
        "1x500": rng.integers(0, 255, (1, 500, 3), dtype=np.uint8),
        "500x1": rng.integers(0, 255, (500, 1, 3), dtype=np.uint8),
        "gray2d": rng.integers(0, 255, (60, 80), dtype=np.uint8),
        "gray3d": rng.integers(0, 255, (60, 80, 1), dtype=np.uint8),
        "rgba": rng.integers(0, 255, (60, 80, 4), dtype=np.uint8),
        "float01": rng.random((60, 80, 3)).astype(np.float32),
        "float255": (rng.random((60, 80, 3)) * 255).astype(np.float32),
    }
    for name, img in cases.items():
        r = predictor.remove_background(img)
        assert r.predicted_mask.shape == img.shape[:2], name
        assert r.rgba_image.size == (img.shape[1], img.shape[0]), name
    with pytest.raises(ValueError):
        predictor.remove_background(np.zeros((4, 5, 7), np.uint8))


def test_rgba_alpha_dropped_matches_rgb(predictor, circle_image):
    """RGBA input must predict identically to its RGB channels (the
    reference's PIL convert("RGB") semantics)."""
    img, _ = circle_image
    rgba = np.dstack([img, np.full(img.shape[:2], 200, np.uint8)])
    a = predictor.remove_background(rgba)
    b = predictor.remove_background(img)
    np.testing.assert_array_equal(a.predicted_mask, b.predicted_mask)


def test_as_rgb_uint8_integer_dtypes_and_zero_dims():
    """Review findings: uint16 must rescale (not saturate to white), bool
    must map to 0/255, and zero-sized images must raise a clear ValueError
    instead of a bare ZeroDivisionError in the letterbox math."""
    from s3od_tpu.utils import as_rgb_uint8, get_pad_info

    u16 = np.full((4, 4, 3), 30000, np.uint16)
    out = as_rgb_uint8(u16)
    assert out.dtype == np.uint8
    assert int(out[0, 0, 0]) == 30000 >> 8  # rescaled, not clipped to 255

    b = as_rgb_uint8(np.ones((4, 4), np.bool_))
    assert b.max() == 255 and b.shape == (4, 4, 3)

    i32 = as_rgb_uint8(np.full((4, 4, 3), 300, np.int32))
    assert i32.max() == 255  # clipped

    with pytest.raises(ValueError):
        as_rgb_uint8(np.zeros((0, 5, 3), np.uint8))
    with pytest.raises(ValueError):
        get_pad_info(np.zeros((0, 5, 3), np.uint8))


def test_research_letterbox_near_square_is_square():
    """Review finding: a near-square image resizes to e.g. (S, S-1) with
    both pads 0; the research predictor's letterbox must still produce a
    square, patch-divisible canvas (the old `canvas = resized` shortcut
    shipped a (S, S-1) array to the jitted forward)."""
    from s3od_tpu.evaluation.predictor import SODPredictor

    p = SODPredictor.__new__(SODPredictor)
    p.image_size = 64
    img = np.random.default_rng(0).integers(
        0, 255, (640, 639, 3), dtype=np.uint8
    )
    canvas, pad_info = p._letterbox(img)
    assert canvas.shape == (64, 64, 3)
    assert pad_info["resized_size"] == (64, 63)
    # And the product predictor path agrees on geometry.
    from s3od_tpu.utils import get_pad_info, place_on_canvas

    pi = get_pad_info(img, 64)
    assert (pi["height_pad"], pi["width_pad"]) == (0, 0)
    placed = place_on_canvas(np.ones((64, 63, 3), np.uint8), 64, pi)
    assert placed.shape == (64, 64, 3) and placed[:, -1].sum() == 0
    # And unpadding must crop that zero column back out even though the
    # pad offset is 0 — otherwise the mask resize stretches/attenuates
    # the right edge (near-square regression).
    from s3od_tpu.utils import remove_padding

    cropped = remove_padding(np.ones((3, 64, 64), np.float32), pi)
    assert cropped.shape == (3, 64, 63)
