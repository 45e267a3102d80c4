"""Shared scaffold for the receipt scripts in this directory.

Every serving experiment needs the same three pieces: bf16 qkv-packed
params for a model config, a jitted uint8 -> (sigmoid masks, sigmoid
ious) serving forward with in-graph ImageNet normalization, and a
host-readback lambda for the slope-timing protocol (CLAUDE.md: only a
host readback synchronizes with the axon relay). Keeping them here means
a change to the serving preprocessing or the readback protocol lands in
one place instead of N copies.
"""

from __future__ import annotations

_preflight_done = False


def preflight(timeout_s: float = 300.0):
    """Subprocess relay probe (s3od_tpu/relay.py) before the first
    in-process JAX touch: a dead relay makes the script exit 2 with a
    message instead of hanging forever. Cached per process.

    300 s + one retry: r4 observed ~180 s probe warmups on a healthy
    relay (two receipt scripts died on flaky probes while the scripts
    before and after them ran fine)."""
    global _preflight_done
    if _preflight_done:
        return
    from s3od_tpu.relay import probe_backend, require_backend

    if not probe_backend(timeout_s).ok:
        require_backend(timeout_s, want="")  # second try, then exit 2
    _preflight_done = True


def build_serving_state(model: str = "dinov3_base", fold_bn: bool = True):
    """(cfg, bf16 qkv-packed params, state) for a serving benchmark.

    ``fold_bn=True`` (default since r5) returns the REAL serving tree —
    BN folded, unpacked qkv dropped — exactly what the predictor compiles
    against (predictor.prepare_serving_params). Receipts captured before
    r5 used the unfolded tree; pass fold_bn=False to reproduce those.
    """
    preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import init_segmentation_params

    cfg = segmentation_config(model)
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    if fold_bn:
        from s3od_tpu.predictor import prepare_serving_params

        params, state, cfg = prepare_serving_params(
            params, state, cfg, jnp.bfloat16
        )
        return cfg, params, state
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv

    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = pack_encoder_qkv(params, cfg.encoder.num_heads)
    return cfg, params, state


def make_serving_forward(cfg, **fw_kwargs):
    """Jitted serving forward: uint8 NHWC -> (sigmoid masks, sigmoid ious).

    Normalization runs in-graph exactly as the predictor's jitted path
    does (s3od_tpu/predictor.py). Extra kwargs are forwarded to
    `segmentation_forward` (e.g. convt_up=..., attn_impl=...).
    """
    import jax
    import jax.numpy as jnp

    from s3od_tpu.models.segmentation import segmentation_forward
    from s3od_tpu.predictor import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN * 255.0)
    inv_std = jnp.asarray(1.0 / (IMAGENET_STD * 255.0))

    @jax.jit
    def forward(params, state, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) * inv_std
        out, _ = segmentation_forward(
            params, state, x.astype(jnp.bfloat16), cfg,
            training=False, compute_dtype=jnp.bfloat16,
            serving_fast_output=True, **fw_kwargs,
        )
        return (jax.nn.sigmoid(out["pred_masks"]),
                jax.nn.sigmoid(out["pred_iou"]))

    return forward


def masks_ious_readback(stride: int = 64):
    """slope_time readback over a (masks, ious) result: one scalar that
    touches both outputs (subsampled masks keep the host transfer tiny)."""
    import jax.numpy as jnp

    def readback(mi):
        masks, ious = mi
        sub = masks[:, ::stride, ::stride]
        return float(jnp.sum(ious) + jnp.sum(sub.astype(jnp.float32)))

    return readback
