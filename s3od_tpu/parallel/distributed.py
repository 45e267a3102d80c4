"""Multi-host (DCN) initialization and hybrid mesh construction.

The reference launches multi-process training with `torchrun --standalone
--nnodes=1 ...` over NCCL (`README.md:169-174`, SURVEY.md §2.5); it never
actually spans hosts. The TPU-native multi-host story (SURVEY §2.5 "TPU-native
equivalents") is built here as a first-class path:

- ``init_distributed()`` wraps ``jax.distributed.initialize``: on TPU pods
  the coordinator/process topology autodetects from the TPU metadata; on
  other setups it reads the standard env vars (JAX_COORDINATOR_ADDRESS /
  JAX_NUM_PROCESSES / JAX_PROCESS_ID, with SLURM_* fallbacks matching the
  reference's SLURM launch habits).
- ``make_hybrid_mesh()`` builds a ('dcn', 'data', 'fsdp') mesh where the
  'dcn' axis follows process (host) granularity, so gradient all-reduce over
  'data'/'fsdp' rides ICI and only the final reduction crosses DCN. Uses
  ``mesh_utils.create_hybrid_device_mesh`` when running multi-process; in a
  single process it reshapes the flat device list (used by the simulated
  2-host dryrun).
- ``process_local_batch()`` assembles a host-local numpy batch into a global
  jax.Array sharded over the mesh — each host feeds only its own shard (the
  per-host data sharding the loader pairs with, see
  ``training/data.py:host_shard``).

Scaling shape: the flagship model is an 86M-param ViT-B trained with pure DP
(+optional fsdp for ViT-L), so the DCN axis only ever carries gradient
all-reduces of ~170MB bf16 — latency-tolerant and fully overlapped by XLA's
collective scheduler.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX over DCN. Returns True when running
    multi-process, False for the single-process fallback.

    Resolution order per field: explicit arg -> JAX_* env -> SLURM_* env ->
    TPU-pod autodetect (args all None). Safe to call twice (idempotent).
    """
    global _INITIALIZED
    if _INITIALIZED or jax.process_count() > 1:
        return jax.process_count() > 1

    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        raw = env.get("JAX_NUM_PROCESSES") or env.get("SLURM_NTASKS")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = env.get("JAX_PROCESS_ID") or env.get("SLURM_PROCID")
        process_id = int(raw) if raw else None
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        # jax.distributed.initialize must precede backend creation; if a
        # backend is already live we are necessarily staying single-process.
        return False
    if coordinator_address is None and num_processes is None:
        # TPU pod runtimes autodetect topology; outside one there is nothing
        # to join — stay single-process.
        if env.get("TPU_WORKER_HOSTNAMES") or env.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            _INITIALIZED = True
            return jax.process_count() > 1
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def make_hybrid_mesh(
    dcn: Optional[int] = None,
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('dcn', 'data', 'fsdp') mesh.

    Multi-process: `dcn` defaults to process_count and the mesh is built with
    `mesh_utils.create_hybrid_device_mesh` so the dcn axis maps exactly to
    host granularity. Single-process (incl. the simulated dryrun): the flat
    device list is reshaped to (dcn, dp, fsdp).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn is None:
        dcn = jax.process_count() if jax.process_count() > 1 else 1
    assert n % dcn == 0, f"{n} devices not divisible by dcn={dcn}"
    per = n // dcn
    if dp is None:
        assert per % fsdp == 0, f"{per} per-dcn devices not divisible by fsdp={fsdp}"
        dp = per // fsdp
    assert dcn * dp * fsdp == n, f"dcn*dp*fsdp={dcn * dp * fsdp} != {n}"

    if jax.process_count() > 1 and devices == list(jax.devices()):
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, dp, fsdp), (dcn, 1, 1), devices=devices
        )
    else:
        arr = np.asarray(devices).reshape(dcn, dp, fsdp)
    return Mesh(arr, axis_names=("dcn", "data", "fsdp"))


def data_axes(mesh: Mesh):
    """The mesh axes the batch dim is sharded over (everything but none)."""
    return tuple(a for a in mesh.axis_names if a in ("dcn", "data", "fsdp"))


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(data_axes(mesh)))


def process_local_batch(batch, mesh: Mesh):
    """Host-local numpy batch pytree -> global sharded jax.Array pytree.

    Each process supplies only its own slice of the global batch (leading dim
    = global_batch / process_count); the result is a jax.Array spanning the
    whole mesh. Single-process: plain device_put with the batch sharding.
    """
    sh = global_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )
