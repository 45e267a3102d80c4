"""Serving runtime + on-device augmentation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params
from s3od_tpu.ops.augment import augment_batch, normalize_imagenet, random_flips
from s3od_tpu.predictor import BackgroundRemoval
from s3od_tpu.serving import InferenceServer


def test_serving_batches_concurrent_requests(circle_image):
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    # warm the jit so batching actually aggregates
    pred.remove_background_batch([img] * 4)

    server = InferenceServer(pred, max_batch=4, max_wait_ms=200).start()
    try:
        futures = [server.submit_async(img) for _ in range(8)]
        results = [f.result(timeout=60) for f in futures]
    finally:
        server.stop()
    single = pred.remove_background(img)
    for r in results:
        np.testing.assert_allclose(
            r.predicted_mask, single.predicted_mask, atol=1e-5
        )
    assert server.stats["requests"] == 8
    assert server.mean_batch_size > 1.0  # actually batched


def test_serving_propagates_errors():
    class Boom:
        def remove_background_batch(self, images):
            raise RuntimeError("boom")

    server = InferenceServer(Boom(), max_batch=2, max_wait_ms=1).start()
    try:
        fut = server.submit_async(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
    finally:
        server.stop()


# ----------------------------------------------------------------------------
# Augmentation
# ----------------------------------------------------------------------------


def _batch(b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
    masks = jnp.asarray((rng.random((b, s, s)) > 0.5), jnp.float32)
    return imgs, masks


@pytest.mark.parametrize(
    "mode",
    ["test", "regular",
     pytest.param("synthetic", marks=pytest.mark.slow)],
)
def test_augment_modes(mode):
    imgs, masks = _batch()
    x, m = augment_batch(jax.random.key(0), imgs, masks, mode)
    assert x.shape == imgs.shape and x.dtype == jnp.float32
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    assert m.shape == masks.shape
    if mode == "test":
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(imgs, np.float32) / 255.0
        )
        np.testing.assert_array_equal(np.asarray(m), np.asarray(masks))


def test_augment_deterministic_per_key():
    imgs, masks = _batch()
    x1, m1 = augment_batch(jax.random.key(7), imgs, masks, "regular")
    x2, m2 = augment_batch(jax.random.key(7), imgs, masks, "regular")
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    x3, _ = augment_batch(jax.random.key(8), imgs, masks, "regular")
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_flips_keep_mask_aligned():
    """A mask marking a corner must move with the image under flips."""
    s = 16
    imgs = np.zeros((8, s, s, 3), np.float32)
    masks = np.zeros((8, s, s), np.float32)
    imgs[:, :4, :4, 0] = 1.0
    masks[:, :4, :4] = 1.0
    x, m = random_flips(jax.random.key(3), jnp.asarray(imgs), jnp.asarray(masks),
                        p_h=1.0, p_v=1.0, p_rot90=0.5)
    x, m = np.asarray(x), np.asarray(m)
    # wherever the red patch went, the mask went too
    np.testing.assert_array_equal((x[..., 0] > 0.5), (m > 0.5))


def test_normalize_imagenet_roundtrip():
    x = jnp.full((1, 4, 4, 3), 0.5, jnp.float32)
    y = np.asarray(normalize_imagenet(x))
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(y[0, 0, 0], expected, atol=1e-6)


def test_slope_time_and_trace_summary(tmp_path):
    from s3od_tpu.profiling import capture_trace, slope_time, summarize_trace

    x = jnp.ones((256, 256))
    f = jax.jit(lambda x: x @ x)
    y = f(x)
    dt = slope_time(lambda: f(x), lambda o: float(o[0, 0]),
                    n_small=2, n_large=6, repeats=1)
    assert dt >= 0
    path = capture_trace(lambda: float(f(x)[0, 0]), str(tmp_path / "tr"), iters=2)
    summary = summarize_trace(path, iters=2)
    assert summary["total_ms"] >= 0 and isinstance(summary["by_category"], list)


def test_remove_background_stream_matches_single(circle_image):
    """Pipelined stream path: ordered results identical to one-at-a-time."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    rng = np.random.default_rng(0)
    images = [
        img,
        (rng.random((90, 130, 3)) * 255).astype(np.uint8),
        (rng.random((140, 100, 3)) * 255).astype(np.uint8),
        img,
        (rng.random((64, 64, 3)) * 255).astype(np.uint8),
    ]
    streamed = list(pred.remove_background_stream(images, depth=2))
    assert len(streamed) == len(images)
    for im, res in zip(images, streamed):
        ref = pred.remove_background(im)
        np.testing.assert_allclose(
            res.predicted_mask, ref.predicted_mask, atol=1e-6
        )
        np.testing.assert_allclose(res.all_ious, ref.all_ious, atol=1e-6)
        assert res.rgba_image.size == ref.rgba_image.size


def test_remove_background_stream_batched_matches_single(circle_image):
    """Throughput streaming (predictor.py stream `batch` param): images are
    grouped into fixed-size device steps (the v5e sweet spot is batch 16);
    ordered results and the padded final partial group must match the
    one-at-a-time path."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    rng = np.random.default_rng(1)
    images = [img] + [
        (rng.random((80 + 9 * i, 100, 3)) * 255).astype(np.uint8)
        for i in range(6)
    ]
    # batch=3 over 7 images -> groups [3, 3, 1(padded to 3)]
    streamed = list(pred.remove_background_stream(images, depth=2, batch=3))
    assert len(streamed) == len(images)
    for im, res in zip(images, streamed):
        ref = pred.remove_background(im)
        np.testing.assert_allclose(
            res.predicted_mask, ref.predicted_mask, atol=1e-6
        )
        np.testing.assert_allclose(res.all_ious, ref.all_ious, atol=1e-6)


def test_payload_best_matches_full(circle_image):
    """Reduced-payload serving (payload="best": on-device argmax-IoU
    selection + uint8 mask readback, ~6x less device->host traffic) must
    select the SAME mask as the full path (the product contract,
    reference `src/s3od/predictor.py:126-130`) and match it to within
    the uint8 quantization (<= 1/510 pre-resize)."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    rng = np.random.default_rng(2)
    images = [
        img,
        (rng.random((90, 130, 3)) * 255).astype(np.uint8),
        (rng.random((140, 100, 3)) * 255).astype(np.uint8),
    ]
    for im in images:
        ref = pred.remove_background(im)
        fast = pred.remove_background(im, payload="best")
        # identical selection: full ious come back in both modes
        np.testing.assert_allclose(fast.all_ious, ref.all_ious, atol=1e-6)
        assert fast.all_masks.shape[0] == 1  # best-only payload
        assert fast.predicted_mask.shape == ref.predicted_mask.shape
        # uint8 quantization on the canvas + antialiased resize
        np.testing.assert_allclose(
            fast.predicted_mask, ref.predicted_mask, atol=3e-3
        )
        # alpha channels agree to within the quantization step
        a_ref = np.asarray(ref.rgba_image)[..., 3].astype(np.int16)
        a_fast = np.asarray(fast.rgba_image)[..., 3].astype(np.int16)
        assert np.abs(a_ref - a_fast).max() <= 1

    # stream + batch variants agree with the single-shot fast path
    streamed = list(pred.remove_background_stream(
        images, depth=2, batch=2, payload="best"
    ))
    batched = pred.remove_background_batch(images, chunk=2, payload="best")
    assert len(streamed) == len(batched) == len(images)
    for im, s, b in zip(images, streamed, batched):
        one = pred.remove_background(im, payload="best")
        np.testing.assert_allclose(s.predicted_mask, one.predicted_mask,
                                   atol=1e-6)
        np.testing.assert_allclose(b.predicted_mask, one.predicted_mask,
                                   atol=1e-6)
        np.testing.assert_allclose(s.all_ious, one.all_ious, atol=1e-6)


def test_payload_best_small(circle_image):
    """Half-resolution reduced payload (payload="best_small": on-device
    2x2 average pool of the selected soft mask, ~4x less readback than
    "best") — identical SELECTION, near-identical final mask after host
    bilinear restore (a soft mask is low-frequency; boundary error is
    subpixel at the original size)."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    rng = np.random.default_rng(5)
    images = [
        img,
        (rng.random((90, 130, 3)) * 255).astype(np.uint8),
    ]
    for im in images:
        ref = pred.remove_background(im, payload="best")
        small = pred.remove_background(im, payload="best_small")
        # Same on-device selection and full iou vector.
        np.testing.assert_allclose(small.all_ious, ref.all_ious, atol=1e-6)
        assert small.all_masks.shape == ref.all_masks.shape
        # Quality gate: low-pass + restore stays close to the full-res
        # best mask everywhere, and the thresholded masks agree almost
        # everywhere (the fixture-tolerance analogue).
        d = np.abs(small.predicted_mask - ref.predicted_mask)
        assert d.mean() < 0.01, d.mean()
        agree = np.mean(
            (small.predicted_mask > 0.5) == (ref.predicted_mask > 0.5)
        )
        assert agree > 0.99, agree

    # stream + batch variants agree with the single-shot path
    streamed = list(pred.remove_background_stream(
        images, depth=2, batch=2, payload="best_small"
    ))
    batched = pred.remove_background_batch(
        images, chunk=2, payload="best_small"
    )
    for im, s, b in zip(images, streamed, batched):
        one = pred.remove_background(im, payload="best_small")
        np.testing.assert_allclose(s.predicted_mask, one.predicted_mask,
                                   atol=1e-6)
        np.testing.assert_allclose(b.predicted_mask, one.predicted_mask,
                                   atol=1e-6)


def test_bucket_upload_matches_canvas(circle_image):
    """Bucketed upload (granule-rounded letterbox buffer + on-device
    canvas completion) must reproduce the host-canvas path bit-exactly
    for every letterbox geometry (wide/tall/near-square/odd pads)."""
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    img, _ = circle_image
    rng = np.random.default_rng(3)
    images = [
        img,
        (rng.random((90, 130, 3)) * 255).astype(np.uint8),   # wide, odd pad
        (rng.random((140, 100, 3)) * 255).astype(np.uint8),  # tall
        (rng.random((127, 128, 3)) * 255).astype(np.uint8),  # near-square
        (rng.random((64, 64, 3)) * 255).astype(np.uint8),    # square
    ]
    # the underlying canvases must be IDENTICAL
    for im in images:
        im8 = pred._as_rgb_uint8(im)
        canvas, _ = pred._preprocess(im8)
        buf, (t, l), _ = pred._bucket_preprocess(im8)
        placed = np.asarray(pred._place_fn()(
            jnp.asarray(buf), jnp.asarray([t, l], jnp.int32)
        ))
        np.testing.assert_array_equal(placed, canvas)

    # same batch grouping on both sides: the comparison isolates the
    # upload path (batch size changes XLA fusion at the 1e-7 level)
    ref = list(pred.remove_background_stream(
        images, upload="canvas", batch=2
    ))
    got = list(pred.remove_background_stream(
        images, upload="bucket", batch=2
    ))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(g.predicted_mask, r.predicted_mask)
        np.testing.assert_array_equal(g.all_ious, r.all_ious)


def test_masks_to_original_cv2_matches_numpy_on_upscale():
    """The cv2 fast path is only taken when upscaling, where torch's
    antialias flag is a no-op — it must agree with the matched numpy
    triangle-filter implementation to float-rounding."""
    import pytest as _pytest

    from s3od_tpu.ops.resize import resize_bilinear_numpy
    from s3od_tpu.predictor import _masks_to_original

    cv2 = _pytest.importorskip("cv2")  # noqa: F841
    rng = np.random.default_rng(0)
    m = rng.random((3, 96, 128)).astype(np.float32)
    got = _masks_to_original(m, (192, 256))
    want = np.clip(
        resize_bilinear_numpy(m, (192, 256), antialias=True,
                              h_axis=1, w_axis=2),
        0.0, 1.0,
    )
    assert np.abs(got - want).max() < 1e-6
    # downscale keeps the exact antialiased path
    got_dn = _masks_to_original(m, (48, 64))
    want_dn = np.clip(
        resize_bilinear_numpy(m, (48, 64), antialias=True,
                              h_axis=1, w_axis=2),
        0.0, 1.0,
    )
    np.testing.assert_array_equal(got_dn, want_dn)


def test_server_stop_fails_queued_requests():
    """stop() must resolve still-queued futures with an error instead of
    leaving blocked submit() callers deadlocked."""
    import pytest

    from s3od_tpu.serving import InferenceServer

    class NeverPredictor:
        def remove_background_batch(self, images, threshold=0.5):
            raise AssertionError("should not run")

    server = InferenceServer(NeverPredictor(), max_batch=4)
    # never started: queued requests must still fail cleanly on stop()
    fut = server.submit_async(np.zeros((8, 8, 3), np.uint8))
    server.stop()
    with pytest.raises(RuntimeError, match="server stopped"):
        fut.result(timeout=5)
    # submitting AFTER stop() must fast-fail instead of enqueueing a
    # request no worker will ever drain (submit() would hang forever)
    with pytest.raises(RuntimeError, match="server stopped"):
        server.submit_async(np.zeros((8, 8, 3), np.uint8))
