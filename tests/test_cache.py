"""Pre-decoded letterbox memmap cache (s3od_tpu/training/cache.py).

The reference re-decodes every PNG every epoch through DataLoader workers
(`model_training/dataset.py:100-144`); the cache decodes once per
(root, image_size) and serves uint8 memmap slices. These tests pin the
contract: exact parity with the uncached pipeline, split determinism,
staleness invalidation, and the uint8-mask flow through the loader and
the train entrypoint.
"""

import json

import numpy as np

from tests.test_train_entrypoint import _write_dataset


def test_cached_load_matches_uncached(tmp_path):
    from s3od_tpu.training.cache import CachedMaskFolderDataset
    from s3od_tpu.training.data import MaskFolderDataset

    ds_dir = _write_dataset(tmp_path, n=10)
    plain = MaskFolderDataset(str(ds_dir), 64, split="train", val_split=0.2)
    cached = CachedMaskFolderDataset(str(ds_dir), 64, split="train",
                                     val_split=0.2)
    assert plain.files == cached.files  # identical deterministic split
    for i in range(len(plain)):
        img_p, mask_p = plain.load(i)
        img_c, mask_c = cached.load(i)
        np.testing.assert_array_equal(img_p, img_c)
        assert mask_c.dtype == np.uint8
        np.testing.assert_array_equal(
            np.round(mask_p * 255.0).astype(np.uint8), mask_c)


def test_cache_reused_and_invalidated(tmp_path):
    from s3od_tpu.training.cache import CachedMaskFolderDataset, build_cache

    ds_dir = _write_dataset(tmp_path, n=6)
    d1 = CachedMaskFolderDataset(str(ds_dir), 64)
    cdir = ds_dir / ".s3od_cache" / "s64"
    meta1 = json.loads((cdir / "meta.json").read_text())
    # Second construction reuses the build (meta identical object on disk).
    mtime = (cdir / "images.npy").stat().st_mtime_ns
    d2 = CachedMaskFolderDataset(str(ds_dir), 64)
    assert (cdir / "images.npy").stat().st_mtime_ns == mtime
    np.testing.assert_array_equal(d1.load(0)[0], d2.load(0)[0])

    # Adding a file invalidates: the rebuilt cache includes it.
    from PIL import Image

    img = np.full((64, 64, 3), 7, np.uint8)
    Image.fromarray(img).save(ds_dir / "images" / "zz_new.png")
    Image.fromarray(img[..., 0]).save(ds_dir / "masks" / "zz_new.png")
    d3 = CachedMaskFolderDataset(str(ds_dir), 64)
    meta3 = json.loads((cdir / "meta.json").read_text())
    assert meta3["files"] != meta1["files"]
    assert "zz_new.png" in meta3["files"]
    assert len(d3._cache_index) == len(meta1["files"]) + 1

    # A different canvas size gets its own shard directory.
    CachedMaskFolderDataset(str(ds_dir), 32)
    assert (ds_dir / ".s3od_cache" / "s32" / "meta.json").exists()


def test_loader_ships_uint8_masks_from_cache(tmp_path):
    from s3od_tpu.training.cache import CachedMaskFolderDataset
    from s3od_tpu.training.data import PrefetchLoader

    ds_dir = _write_dataset(tmp_path, n=8)
    ds = CachedMaskFolderDataset(str(ds_dir), 64, split="train",
                                 val_split=0.0)
    loader = PrefetchLoader(ds, 4, shuffle=True, seed=1, num_threads=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["images"].dtype == np.uint8
        assert b["masks"].dtype == np.uint8  # uint8 stays on the wire
        assert b["masks"].shape == (4, 64, 64)


def test_train_entrypoint_with_cache(tmp_path):
    """dataset.cache=true through the whole entrypoint: metrics parity in
    kind with the uncached run (finite loss, checkpoints written)."""
    from s3od_tpu.training.train import train

    _write_dataset(tmp_path, n=12)
    base = tmp_path / "out"
    metrics = train([
        "dataset=duts",
        "dataset.paths=[tinyds]",
        "dataset.image_size=64",
        "dataset.train_batch_size=2",
        "dataset.val_batch_size=1",
        "dataset.val_split=0.25",
        "dataset.transform_mode=regular",  # uint8 masks + host geometric
        "dataset.test_datasets=[]",
        "dataset.cache=true",
        "model=tiny",
        "backend=cpu",
        "backend.accelerator=auto",
        "backend.devices=2",
        "backend.max_epochs=1",
        "backend.num_threads=2",
        f"data_dir={tmp_path}",
        f"base_dir={base}",
    ])
    assert np.isfinite(metrics["train_loss"])
    assert np.isfinite(metrics["val_dice"])
    assert (tmp_path / "tinyds" / ".s3od_cache" / "s64" / "meta.json").exists()
