"""AOT serving artifacts + persistent compilation cache.

The TPU-native analog of the reference's TorchScript export
(`/root/reference/scripts/export_model.py:122-172`, which scripts the
traced model and verifies it numerically): the 1024² serving graph is
lowered with `jax.export` into a portable StableHLO artifact, persisted
next to the prepared weight tree, and reloaded by
`BackgroundRemoval.from_serving_bundle` — a fresh serving process then
runs the exported graph without re-tracing the model.

Cold-start on the axon relay costs 20-90 s of remote compiles per fresh
process; two mechanisms attack it:
- the persistent XLA compilation cache (`jax_compilation_cache_dir`,
  `enable_compilation_cache`) caches compiled executables across
  processes — warm hits skip device compilation entirely;
- the exported artifact removes Python-side tracing/lowering and pins
  the exact serving graph (same bytes -> same cache key, where a retrace
  could produce a cache-missing variant).

Bundle layout (a directory):
    weights.npz        prepared serving tree (BN folded, qkv packed),
                       fp32-upcast for npz portability (bf16 has no
                       native npy encoding; bf16->fp32->bf16 is exact)
    meta.json          {encoder, image_size, dtype, batches, platforms}
    serving_b{N}.jaxexport   serialized Exported per batch bucket
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

_DEFAULT_CACHE_DIR = "~/.cache/s3od_tpu/xla_cache"


def device_put_packed(tree):
    """Upload a host-resident (numpy-leaf) pytree in ONE transfer per
    dtype instead of one per leaf.

    Over the axon relay every per-leaf `device_put` is a separate RPC
    (~0.2-0.5 s each); a converted checkpoint has ~300 leaves, so naive
    leaf-by-leaf placement costs 60-150 s of pure round-trips — measured
    as the dominant cold-start term (benchmarks/exp_cold_start.py: load
    66-165 s vs ~15 s of actual compile). Here leaves are concatenated
    by dtype on the host, uploaded as 1-3 flat blobs, and split back
    into leaves by a single jitted slicing program (cacheable in the
    persistent compilation cache like any other program).

    Leaves already on device are passed through untouched (their bytes
    are already resident)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    # Numeric kinds only (+ 'V' for ml_dtypes extension floats like
    # bfloat16): np.isscalar is also True for str/bytes, which must pass
    # through untouched rather than be concatenated into a numeric blob
    # (or silently become 0-d device arrays).
    _KINDS = "fiubV"

    def _packable(l):
        if isinstance(l, np.ndarray):
            return l.dtype.kind in _KINDS
        return np.isscalar(l) and np.asarray(l).dtype.kind in _KINDS

    host = [
        (i, np.asarray(l)) for i, l in enumerate(leaves) if _packable(l)
    ]
    if not host:
        return tree

    blobs: dict = {}
    specs = []  # (leaf_index, dtype_key, offset, size, shape)
    for i, a in host:
        k = np.dtype(a.dtype).str
        parts = blobs.setdefault(k, [])
        off = sum(p.size for p in parts)
        specs.append((i, k, off, a.size, a.shape))
        parts.append(a.ravel())
    blob_arrays = {k: jnp.asarray(np.concatenate(v)) for k, v in blobs.items()}

    @jax.jit
    def unpack(blob_map):
        out = []
        for _, k, off, size, shape in specs:
            out.append(
                jax.lax.slice(blob_map[k], (off,), (off + size,))
                .reshape(shape)
            )
        return tuple(out)

    for (i, _, _, _, _), dev in zip(specs, unpack(blob_arrays)):
        leaves[i] = dev
    return jax.tree.unflatten(treedef, leaves)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at a durable directory
    (idempotent; an explicitly configured cache dir is left alone).
    Override with $S3OD_COMPILE_CACHE; returns the active dir."""
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = cache_dir or os.environ.get(
        "S3OD_COMPILE_CACHE", _DEFAULT_CACHE_DIR
    )
    cache_dir = str(Path(cache_dir).expanduser())
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving graphs all take >1 s to compile, but the tiny reduce/util
    # programs around them benefit too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return cache_dir


def export_serving(
    params, state, cfg, *,
    image_size: int,
    batch: int,
    compute_dtype,
    platforms: Optional[Sequence[str]] = None,
    payload: str = "full",
):
    """Lower the serving graph for one batch bucket into a
    `jax.export.Exported`. ``platforms`` allows cross-lowering (e.g.
    export for "tpu" from a CPU host); None targets the default backend.
    ``payload`` selects the readback shape ("full" soft masks vs "best"
    uint8 selected mask — see predictor.build_serving_forward)."""
    import jax
    from jax import export as jexport

    from s3od_tpu.predictor import build_serving_forward

    fn = build_serving_forward(cfg, compute_dtype, payload=payload)
    abstract = jax.tree.map(
        lambda t: jax.ShapeDtypeStruct(np.shape(t), t.dtype), (params, state)
    )
    img_spec = jax.ShapeDtypeStruct(
        (batch, image_size, image_size, 3), np.uint8
    )
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(fn, **kwargs)(*abstract, img_spec)


@dataclass
class ServingBundle:
    params: dict
    state: Optional[dict]
    cfg: object
    meta: dict
    exported: Dict[tuple, object]  # (batch, payload) -> jax.export.Exported


def save_serving_bundle(
    path, params, state, cfg, *,
    image_size: int = 1024,
    batches: Sequence[int] = (1, 16),
    dtype: str = "bfloat16",
    platforms: Optional[Sequence[str]] = None,
    fold_bn: bool = True,
    payloads: Sequence[str] = ("full", "best"),
) -> Path:
    """Prepare the serving tree and export one graph per batch bucket.

    ``params``/``state`` are a raw checkpoint tree; the same load-time
    transforms the predictor applies (prepare_serving_params) run here
    ONCE and are persisted, so bundle loads skip them.

    Export production bundles ON the TPU backend: attention-impl
    resolution reads `jax.default_backend()` at trace time, so a bundle
    exported from a CPU host bakes the XLA attention path even with
    ``platforms=["tpu"]`` (it runs on TPU, but without the flash/fused
    Pallas kernels — ~2x slower at 1024px)."""
    import jax.numpy as jnp

    from s3od_tpu.convert import save_native
    from s3od_tpu.predictor import prepare_serving_params

    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params, state, cfg = prepare_serving_params(
        params, state, cfg, compute_dtype, fold_bn=fold_bn
    )

    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)

    # npz portability: upcast bf16 leaves to fp32 (exact; re-cast on load).
    import jax

    params_f32 = jax.tree.map(
        lambda t: np.asarray(t, np.float32)
        if getattr(t, "dtype", None) == jnp.bfloat16 else np.asarray(t),
        params,
    )
    save_native(str(out / "weights.npz"), params_f32, state)

    from jax import export as jexport

    exported_batches = []
    payload_map: Dict[str, list] = {}
    for payload in payloads:
        for b in batches:
            exp = export_serving(
                params, state, cfg,
                image_size=image_size, batch=b, compute_dtype=compute_dtype,
                platforms=platforms, payload=payload,
            )
            suffix = "" if payload == "full" else f".{payload}"
            (out / f"serving_b{b}{suffix}.jaxexport").write_bytes(
                exp.serialize()
            )
            payload_map.setdefault(payload, []).append(b)
            if payload == "full":
                exported_batches.append(b)

    meta = {
        "format": "s3od_tpu.serving_bundle.v1",
        "encoder_hidden": cfg.encoder.hidden_size,
        "use_bn": cfg.use_bn,  # False once fold_bn ran (state is None then)
        "image_size": image_size,
        "dtype": dtype,
        "batches": exported_batches,  # "full" graphs (back-compat key)
        "payloads": payload_map,
        "platforms": list(platforms) if platforms else None,
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    return out


def load_serving_bundle(path) -> ServingBundle:
    """Load a bundle directory: prepared weights + deserialized graphs."""
    import jax.numpy as jnp
    from jax import export as jexport

    from s3od_tpu.convert import load_native_segmentation

    p = Path(path)
    meta = json.loads((p / "meta.json").read_text())
    if meta.get("format") != "s3od_tpu.serving_bundle.v1":
        raise ValueError(f"not a serving bundle: {p}")
    params, state, cfg = load_native_segmentation(p / "weights.npz")
    if cfg.use_bn != meta["use_bn"]:
        # The inferred config assumes the checkpoint family default; a
        # BN-folded bundle tree carries no BN state.
        import dataclasses

        cfg = dataclasses.replace(cfg, use_bn=meta["use_bn"])
    if meta["dtype"] == "bfloat16":
        import jax

        params = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if getattr(t, "dtype", None) == np.float32 else t,
            params,
        )
    exported = {}
    payload_map = meta.get("payloads") or {"full": meta["batches"]}
    for payload, bs in payload_map.items():
        suffix = "" if payload == "full" else f".{payload}"
        for b in bs:
            data = (p / f"serving_b{b}{suffix}.jaxexport").read_bytes()
            exported[(b, payload)] = jexport.deserialize(bytearray(data))
    return ServingBundle(params, state, cfg, meta, exported)


def verify_bundle(
    bundle: ServingBundle, n: int = 2, tol: float = 1e-5
) -> float:
    """Numerical verification of the exported graphs against the jitted
    serving graph on random inputs (mirrors the reference's TorchScript
    verification loop, `scripts/export_model.py:46-80`). Returns the
    worst max-abs-diff; raises over ``tol``."""
    import jax.numpy as jnp

    from s3od_tpu.predictor import build_serving_forward

    compute_dtype = (
        jnp.bfloat16 if bundle.meta["dtype"] == "bfloat16" else jnp.float32
    )
    ref_fns = {
        payload: build_serving_forward(
            bundle.cfg, compute_dtype, payload=payload
        )
        for payload in {p for _, p in bundle.exported}
    }
    size = bundle.meta["image_size"]
    rng = np.random.default_rng(0)
    worst = 0.0
    for (b, payload), exp in bundle.exported.items():
        ref_fn = ref_fns[payload]
        for _ in range(n):
            imgs = rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
            got_m, got_i = exp.call(bundle.params, bundle.state, imgs)
            ref_m, ref_i = ref_fn(bundle.params, bundle.state, imgs)
            mask_diff = float(jnp.abs(got_m.astype(jnp.float32)
                                      - ref_m.astype(jnp.float32)).max())
            if payload == "best":
                # uint8 masks: the smallest possible disagreement is a
                # whole step of 1 (a 0.5-boundary rounding flip, or an
                # argmax-IoU tie resolving differently across platforms),
                # so a <=1 step is benign — only larger mask differences
                # count against the float tolerance. IoUs stay float.
                if mask_diff <= 1.0:
                    mask_diff = 0.0
            worst = max(
                worst,
                mask_diff,
                float(jnp.abs(got_i.astype(jnp.float32)
                              - ref_i.astype(jnp.float32)).max()),
            )
    if worst > tol:
        raise AssertionError(
            f"bundle verification failed: max-abs-diff {worst:.2e} > {tol}"
        )
    return worst
