"""AOT serving bundles (s3od_tpu/aot.py) — the TorchScript-export analog.

Mirrors the reference's TorchScript contract (`scripts/export_model.py:122-172`:
export + numerical verification loop): the exported StableHLO serving
graphs must round-trip through disk and match the jitted graph, and the
bundle-loaded predictor must match the plain one end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.aot import (
    enable_compilation_cache,
    load_serving_bundle,
    save_serving_bundle,
    verify_bundle,
)
from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params


@pytest.fixture(scope="module")
def tiny_tree():
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    return params, state, cfg


def test_bundle_roundtrip_and_verify(tmp_path, tiny_tree):
    params, state, cfg = tiny_tree
    out = save_serving_bundle(
        tmp_path / "bundle", params, state, cfg,
        image_size=128, batches=(1, 2), dtype="float32",
    )
    assert (out / "meta.json").exists()
    assert (out / "weights.npz").exists()
    assert (out / "serving_b1.jaxexport").exists()
    assert (out / "serving_b2.jaxexport").exists()

    assert (out / "serving_b1.best.jaxexport").exists()

    bundle = load_serving_bundle(out)
    assert bundle.meta["image_size"] == 128
    assert not bundle.cfg.use_bn  # BN was folded at save time
    assert sorted(bundle.exported) == [
        (1, "best"), (1, "full"), (2, "best"), (2, "full")
    ]
    worst = verify_bundle(bundle, n=2)
    assert worst < 1e-5


def test_bundle_predictor_matches_plain(tmp_path, tiny_tree):
    from s3od_tpu.predictor import BackgroundRemoval

    params, state, cfg = tiny_tree
    out = save_serving_bundle(
        tmp_path / "bundle", params, state, cfg,
        image_size=128, batches=(1,), dtype="float32",
    )

    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)

    plain = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    aot = BackgroundRemoval.from_serving_bundle(out, dtype="float32")
    assert aot.image_size == 128
    assert aot._aot_canvas == 128

    res_plain = plain.remove_background(image)
    res_aot = aot.remove_background(image)
    np.testing.assert_allclose(
        res_aot.predicted_mask, res_plain.predicted_mask, atol=1e-5
    )
    np.testing.assert_allclose(
        res_aot.all_ious, res_plain.all_ious, atol=1e-6
    )
    # Unknown batch sizes fall back to the jitted graph transparently.
    batch = aot.remove_background_batch([image, image, image], chunk=4)
    assert len(batch) == 3


def test_enable_compilation_cache_idempotent(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = enable_compilation_cache(str(tmp_path / "cache"))
        assert jax.config.jax_compilation_cache_dir == d
        # second call: existing configuration wins
        d2 = enable_compilation_cache(str(tmp_path / "other"))
        assert d2 == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_bundle_rejects_non_bundle_dir(tmp_path):
    (tmp_path / "meta.json").write_text('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a serving bundle"):
        load_serving_bundle(tmp_path)


def test_bundle_bf16_weights_roundtrip_exact(tmp_path, tiny_tree):
    """bf16 serving trees persist as fp32 npz (no native bf16 npy
    encoding); bf16 -> fp32 -> bf16 must be bit-exact and the reloaded
    tree must carry the packed-qkv serving layout with no duplicate."""
    params, state, cfg = tiny_tree
    out = save_serving_bundle(
        tmp_path / "b16", params, state, cfg,
        image_size=64, batches=(1,), dtype="bfloat16",
    )
    bundle = load_serving_bundle(out)

    from s3od_tpu.predictor import prepare_serving_params

    ref_params, _, _ = prepare_serving_params(
        params, state, cfg, jnp.bfloat16, fold_bn=True
    )
    ref_leaves = jax.tree.leaves(ref_params)
    got_leaves = jax.tree.leaves(bundle.params)
    assert len(ref_leaves) == len(got_leaves)
    for r, g in zip(ref_leaves, got_leaves):
        assert g.dtype == r.dtype
        np.testing.assert_array_equal(
            np.asarray(g, np.float32), np.asarray(r, np.float32)
        )
    for blk in bundle.params["encoder"]["blocks"]:
        assert "qkv" not in blk["attention"]
        assert "qkv_packed" in blk["attention"]


def test_device_put_packed_roundtrip(tiny_tree):
    """Packed one-transfer upload: values, dtypes and tree structure are
    preserved exactly; device leaves pass through; mixed trees work."""
    import ml_dtypes

    from s3od_tpu.aot import device_put_packed

    params, state, cfg = tiny_tree
    host_tree = jax.tree.map(np.asarray, {"p": params, "s": state})
    # mix in a bf16 leaf and an already-on-device leaf
    host_tree["b16"] = np.arange(6, dtype=np.float32).reshape(2, 3).astype(
        ml_dtypes.bfloat16)
    host_tree["dev"] = jnp.ones((3,), jnp.float32)
    # Non-numeric leaves must pass through UNTOUCHED (not be concatenated
    # into a numeric blob, not become 0-d device arrays).
    host_tree["tag"] = "a-string-leaf"

    out = device_put_packed(host_tree)
    assert out["tag"] is host_tree["tag"]
    del out["tag"], host_tree["tag"]
    ref_l, ref_d = jax.tree.flatten(host_tree)
    got_l, got_d = jax.tree.flatten(out)
    assert ref_d == got_d
    for r, g in zip(ref_l, got_l):
        assert hasattr(g, "devices")  # everything on device now
        assert np.dtype(g.dtype) == np.dtype(r.dtype)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
