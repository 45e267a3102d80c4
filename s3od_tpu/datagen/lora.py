"""LoRA finetuning for the MMDiT (FLUX LoRA equivalent).

The reference fine-tunes FLUX with a LoRA on real SOD data
(`data_generation/flux_finetune/`, used via `lora_path` in
`data_generation/pipeline.py:58-88`). TPU-native version: low-rank adapters
over the MMDiT's linear kernels as a separate pytree, merged functionally
inside the jitted step (`W_eff = W + scale * A @ B`), trained with the
rectified-flow matching loss; the base weights stay frozen (only the LoRA
tree gets gradients).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Kernel paths (relative to a block) that receive adapters.
DUAL_TARGETS = [
    ("img_attn", "qkv"), ("img_attn", "proj"),
    ("txt_attn", "qkv"), ("txt_attn", "proj"),
]
SINGLE_TARGETS = [("qkv",), ("proj_out",)]


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 16.0

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def init_lora_params(key: jax.Array, mmdit_params: dict, cfg: LoRAConfig) -> dict:
    """LoRA tree mirroring the targeted kernels: {'A': (in, r), 'B': (r, out)}.
    A ~ N(0, 1/r), B = 0 (standard init: adapter starts as identity)."""
    keys = iter(jax.random.split(key, 4096))

    def adapter(kernel):
        din, dout = kernel.shape
        return {
            "A": jax.random.normal(next(keys), (din, cfg.rank), jnp.float32)
            / cfg.rank,
            "B": jnp.zeros((cfg.rank, dout), jnp.float32),
        }

    def block_adapters(blk, targets):
        # NESTED by path segments (not "/"-joined keys): the npz codec
        # (`convert._flatten`) uses "/" as its separator, so flat keys with
        # "/" would change structure across a save/load round trip and
        # merge_lora could no longer find them.
        out: dict = {}
        for p in targets:
            node = out
            for seg in p[:-1]:
                node = node.setdefault(seg, {})
            node[p[-1]] = adapter(_get(blk, p)["kernel"])
        return out

    return {
        "dual_blocks": [
            block_adapters(b, DUAL_TARGETS)
            for b in mmdit_params["dual_blocks"]
        ],
        "single_blocks": [
            block_adapters(b, SINGLE_TARGETS)
            for b in mmdit_params["single_blocks"]
        ],
    }


def merge_lora(mmdit_params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Effective params with adapters folded in (pure; safe under jit)."""
    out = {k: v for k, v in mmdit_params.items()}

    def _set(tree, path, leaf):
        tree = dict(tree)
        if len(path) == 1:
            tree[path[0]] = leaf
            return tree
        tree[path[0]] = _set(tree[path[0]], path[1:], leaf)
        return tree

    def apply_block(blk, adapters, targets):
        for path in targets:
            ad = _get(adapters, path)
            leaf = dict(_get(blk, path))
            delta = cfg.scale * jnp.matmul(ad["A"], ad["B"])
            leaf["kernel"] = leaf["kernel"] + delta.astype(leaf["kernel"].dtype)
            blk = _set(blk, path, leaf)
        return blk

    out["dual_blocks"] = [
        apply_block(b, a, DUAL_TARGETS)
        for b, a in zip(mmdit_params["dual_blocks"], lora["dual_blocks"])
    ]
    out["single_blocks"] = [
        apply_block(b, a, SINGLE_TARGETS)
        for b, a in zip(mmdit_params["single_blocks"], lora["single_blocks"])
    ]
    return out


def make_lora_train_step(mmdit_cfg, lora_cfg: LoRAConfig, optimizer):
    """Rectified-flow matching step on LoRA params only.

    batch: {'latents': packed (B,N,C), 'txt': (B,L,Dt), 'pooled': (B,Dp),
            'img_ids': (N,3), 'txt_ids': (L,3)}.
    Loss: || v_theta(x_t, t) - (noise - x0) ||^2 with t ~ logit-normal.
    """
    from s3od_tpu.models.mmdit import mmdit_forward

    def loss_fn(lora, params, batch, rng):
        r1, r2 = jax.random.split(rng)
        x0 = batch["latents"]
        b = x0.shape[0]
        t = jax.nn.sigmoid(jax.random.normal(r1, (b,)))  # logit-normal
        noise = jax.random.normal(r2, x0.shape, x0.dtype)
        xt = (1 - t[:, None, None]) * x0 + t[:, None, None] * noise
        eff = merge_lora(params, lora, lora_cfg)
        out = mmdit_forward(
            eff, mmdit_cfg, latents=xt, txt=batch["txt"],
            pooled=batch["pooled"], timestep=t, img_ids=batch["img_ids"],
            txt_ids=batch["txt_ids"],
            guidance=jnp.full((b,), 1.0, jnp.float32),
        )
        target = noise - x0
        return jnp.mean((out["output"] - target) ** 2)

    @jax.jit
    def step(lora, opt_state, params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(lora, params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax

        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
