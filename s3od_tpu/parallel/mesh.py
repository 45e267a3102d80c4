"""Device mesh + sharding rules (the scaling-book pjit recipe).

The reference's only training parallelism is Lightning DDP/FSDP over NCCL
(SURVEY.md §2.5). TPU-native equivalent: one `jax.sharding.Mesh` with axes

  - ``data``: pure data parallelism (gradient all-reduce rides ICI)
  - ``fsdp``: parameter sharding (ZeRO-3-style); also consumes batch

Everything goes through `jax.jit` with `NamedSharding` constraints — XLA
inserts the all-gathers/reduce-scatters. Batch is sharded over (data, fsdp)
jointly; parameters are replicated over `data` and sharded over `fsdp` along
their largest divisible axis.

BatchNorm in the DPT head becomes cross-replica (sync-BN) for free: under jit
the batch-axis mean is a global mean because the batch is sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'fsdp') mesh. `dp` defaults to n_devices // fsdp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
        dp = n // fsdp
    assert dp * fsdp == n, f"dp*fsdp={dp * fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def _kernel_spec(path_leaf: jax.Array, fsdp_size: int) -> P:
    """Shard the largest divisible axis of a >=2D kernel along 'fsdp'."""
    shape = path_leaf.shape
    if fsdp_size <= 1 or len(shape) < 2:
        return P()
    # Prefer the largest axis; require divisibility.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % fsdp_size == 0 and shape[ax] >= 2 * fsdp_size:
            spec = [None] * len(shape)
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: fsdp-shard big kernels, replicate the rest."""
    fsdp_size = mesh.shape["fsdp"]

    def one(leaf):
        if leaf is None:
            return None
        return NamedSharding(mesh, _kernel_spec(leaf, fsdp_size))

    return jax.tree.map(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every mesh axis ([dcn x] data x fsdp)."""
    axes = tuple(a for a in ("dcn", "data", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
