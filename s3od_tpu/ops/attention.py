"""Attention ops.

The ViT runs at 1024² → 4096 patch tokens + 5 prefix tokens = 4101 sequence
length (reference hot loop #1, SURVEY.md §3.1). Two implementations:

- ``xla``: plain einsum attention with fp32 softmax accumulation. XLA already
  fuses this well on TPU and it is the reference-numerics baseline.
- ``flash``: Pallas TPU flash-attention kernel (see s3od_tpu/ops/flash_attention.py),
  used automatically on TPU backends for long sequences.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from s3od_tpu.ops.precision import dot_precision


def _xla_attention(q, k, v, scale, n_valid=0):
    """q, k, v: (B, N, H, D). Softmax in fp32 regardless of input dtype."""
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=dot_precision(q, k),
    )
    logits = logits * scale
    if n_valid and n_valid < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < n_valid
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v, precision=dot_precision(probs, v))
    return out


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def resolve_attn_impl(n: int, dtype, impl: str = "auto") -> str:
    """Resolve "auto" to the implementation that will actually run. Flash
    only for bf16 (its MXU passes are bf16-precision; fp32 exact mode must
    keep the HIGHEST-precision XLA path) and long sequences."""
    if impl != "auto":
        return impl
    use_flash = _flash_available() and n >= 1024 and dtype == jnp.bfloat16
    return "flash" if use_flash else "xla"


def attn_seq_len(n: int, dtype, impl: str = "auto", head_dim: int = 64) -> int:
    """Sequence length the encoder should pad tokens to so the flash kernel
    sees an exact block fit (no per-layer pad/slice copies). Returns `n`
    when the XLA path will run."""
    if resolve_attn_impl(n, dtype, impl) != "flash":
        return n
    from s3od_tpu.ops.flash_attention import flash_seq_len

    return flash_seq_len(n, head_dim)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
    n_valid: int = 0,
    static_softmax_bound: bool = False,
) -> jax.Array:
    """Multi-head attention over (B, N, H, D) tensors. Returns (B, N, H, D).

    ``impl``: "auto" | "xla" | "flash". ``n_valid``: true token count when
    the sequence carries trailing padding rows (keys beyond it are masked;
    the garbage outputs at padding rows are the caller's to discard).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = resolve_attn_impl(q.shape[1], q.dtype, impl)
    if impl == "flash":
        from s3od_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, scale=scale, n_valid=n_valid,
            static_softmax_bound=static_softmax_bound,
        )
    return _xla_attention(q, k, v, scale, n_valid=n_valid)
