"""Multi-host (DCN) plumbing: hybrid mesh, batch sharding, loader sharding.

TPU-native equivalent of the reference's torchrun/SLURM multi-process launch
(SURVEY.md §2.5); these tests run single-process on the 8-device virtual CPU
mesh and validate the mesh/sharding/loader math the multi-process path uses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from s3od_tpu.parallel import (
    batch_sharding,
    global_batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    param_shardings,
    process_local_batch,
)


def test_hybrid_mesh_axes_and_shape():
    mesh = make_hybrid_mesh(dcn=2, fsdp=2)
    assert mesh.axis_names == ("dcn", "data", "fsdp")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "fsdp": 2}


def test_hybrid_mesh_batch_sharded_over_all_axes():
    mesh = make_hybrid_mesh(dcn=2, fsdp=1)
    sh = global_batch_sharding(mesh)
    assert sh.spec == P(("dcn", "data", "fsdp"))
    batch = {"images": np.zeros((16, 8, 8, 3), np.float32)}
    global_batch = process_local_batch(batch, mesh)
    arr = global_batch["images"]
    assert arr.shape == (16, 8, 8, 3)
    # 8 devices -> each holds 2 samples.
    assert arr.addressable_shards[0].data.shape[0] == 2


def test_param_sharding_replicates_over_dcn():
    mesh = make_hybrid_mesh(dcn=2, fsdp=2)
    params = {"w": jnp.zeros((64, 32)), "b": jnp.zeros((32,))}
    sh = param_shardings(params, mesh)
    # Kernel fsdp-sharded on one axis, replicated over dcn/data.
    assert "fsdp" in tuple(sh["w"].spec) and "dcn" not in tuple(sh["w"].spec)
    assert sh["b"].spec == P()


def test_legacy_mesh_batch_sharding_unchanged():
    from s3od_tpu.parallel import make_mesh

    mesh = make_mesh(fsdp=2)
    assert batch_sharding(mesh).spec == P(("data", "fsdp"))


def test_init_distributed_single_process_noop():
    assert init_distributed() is False
    assert jax.process_count() == 1


def test_loader_process_shard_disjoint_and_deterministic():
    from s3od_tpu.training.data import PrefetchLoader

    class FakeDataset:
        def __len__(self):
            return 41

        def load(self, i):
            img = np.full((8, 8, 3), i, np.uint8)
            return img, np.full((8, 8), i, np.float32)

    def collect(pid, pc):
        loader = PrefetchLoader(
            FakeDataset(), batch_size=2, seed=7, num_threads=2,
            process_shard=(pid, pc),
        )
        ids = []
        for batch in loader.epoch(3):
            ids.extend(batch["images"][:, 0, 0, 0].astype(int).tolist())
        return ids

    a = collect(0, 2)
    b = collect(1, 2)
    # Disjoint coverage, equal batch counts on every host.
    assert set(a).isdisjoint(b)
    assert len(a) == len(b)
    # Deterministic: same host sees the same order again.
    assert a == collect(0, 2)
    # Together they cover 40 of 41 samples (truncated to a pc multiple).
    assert len(set(a) | set(b)) == 40


def test_loader_unsharded_unchanged():
    from s3od_tpu.training.data import PrefetchLoader

    class FakeDataset:
        def __len__(self):
            return 10

        def load(self, i):
            return np.zeros((4, 4, 3), np.uint8), np.zeros((4, 4), np.float32)

    loader = PrefetchLoader(FakeDataset(), batch_size=2, num_threads=1)
    assert len(loader) == 5
    assert sum(1 for _ in loader.epoch(0)) == 5


def test_loader_surfaces_worker_exception():
    """A loader-worker failure must RAISE in the training loop, not kill the
    producer thread before the end sentinel and hang the consumer forever."""
    import pytest

    from s3od_tpu.training.data import PrefetchLoader

    class PoisonDataset:
        def __len__(self):
            return 8

        def load(self, i):
            if i == 5:
                raise RuntimeError("corrupt sample")
            img = np.full((8, 8, 3), i, np.uint8)
            return img, np.full((8, 8), i, np.float32)

    loader = PrefetchLoader(
        PoisonDataset(), batch_size=2, shuffle=False, num_threads=2, seed=0
    )
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader.epoch(0):
            pass


def test_loader_augmentation_reproducible_across_thread_counts():
    """Per-batch RNG: augmentation draws must not depend on thread
    scheduling (a shared Random across the pool made seeded runs
    irreproducible)."""
    from s3od_tpu.training.data import PrefetchLoader

    class FakeDataset:
        def __len__(self):
            return 16

        def load(self, i):
            img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
                   + np.uint8(i))
            return img, np.full((8, 8), i % 2, np.float32)

    def run(threads):
        loader = PrefetchLoader(
            FakeDataset(), batch_size=2, shuffle=False, seed=3,
            num_threads=threads, random_resized_crop_p=1.0,
        )
        return [b["images"].copy() for b in loader.epoch(1)]

    a, b = run(1), run(4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_full_depth_mmdit_fsdp_parity():
    """The REAL FLUX topology (19 dual + 38 single blocks, production
    feature taps) at reduced hidden width: the fsdp-sharded forward on
    the 8-device virtual mesh must match the single-device replicated
    forward (VERDICT r3 missing #2 — the full depth had never executed
    anywhere; sharding must not change the math)."""
    import jax
    import jax.numpy as jnp

    from s3od_tpu.datagen.diffusion import make_img_ids
    from s3od_tpu.models.mmdit import (
        MMDiTConfig,
        init_mmdit_params,
        mmdit_forward,
    )
    from s3od_tpu.parallel import make_mesh, shard_params

    cfg = MMDiTConfig(
        hidden_size=256, num_heads=2,  # head_dim 128 = sum(axes_dims)
        num_dual_blocks=19, num_single_blocks=38,
        text_dim=64, pooled_dim=32,
    )
    params = init_mmdit_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ph = pw = 4
    args = dict(
        timestep=jnp.full((1,), 0.7),
        img_ids=jnp.asarray(make_img_ids(ph, pw)),
        txt_ids=jnp.zeros((8, 3), jnp.float32),
        guidance=jnp.full((1,), 3.5),
        compute_dtype=jnp.float32,
    )
    lat = jnp.asarray(
        rng.standard_normal((1, ph * pw, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)

    def fwd(p):
        return mmdit_forward(p, cfg, latents=lat, txt=txt, pooled=pooled,
                             **args)

    ref = jax.jit(fwd)(params)
    mesh = make_mesh(dp=1, fsdp=8)
    sharded = jax.jit(fwd)(shard_params(params, mesh))

    assert len(ref["features"]) == 4  # taps (4,16,27,36) all fire
    np.testing.assert_allclose(
        np.asarray(sharded["output"]), np.asarray(ref["output"]),
        atol=2e-5, rtol=1e-5,
    )
    for a, b in zip(sharded["features"], ref["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        )


def test_device_prefetch_orders_and_propagates():
    """device_prefetch (training/data.py): yields (i, put(i, batch)) in
    order with a bounded look-ahead, and surfaces producer exceptions
    instead of deadlocking the consumer."""
    import time

    from s3od_tpu.training.data import device_prefetch

    calls = []

    def put(i, b):
        calls.append(i)
        return b * 10

    out = list(device_prefetch(iter(range(6)), put, depth=2))
    assert out == [(i, i * 10) for i in range(6)]
    assert calls == list(range(6))

    def boom(i, b):
        if b == 2:
            raise RuntimeError("upload failed")
        return b

    got = []
    with pytest.raises(RuntimeError, match="upload failed"):
        for i, b in device_prefetch(iter(range(6)), boom, depth=2):
            got.append(b)
    assert got == [0, 1]

    # early consumer exit must not leave the producer thread spinning
    gen = device_prefetch(iter(range(100)), put, depth=2)
    next(gen)
    gen.close()
    time.sleep(0.1)
    n_after = len(calls)
    time.sleep(0.3)
    assert len(calls) <= n_after + 3  # bounded by depth, then stops
