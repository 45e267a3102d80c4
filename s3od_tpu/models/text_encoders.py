"""JAX-native FLUX text conditioning: T5 v1.1 encoder + CLIP text (pooled).

The reference's factory encodes prompts host-side through transformers on
CUDA — CLIP pooled + T5 sequence features feeding the MMDiT
(`synth_sod/src/synth_sod/data_generation/concept_attention/`
`flux_with_concept_attention_pipeline.py:907-941`, and concept tokens via
T5 first-token embedding `:383-435`). A TPU-first factory runs that math
on-chip: these are functional JAX ports of transformers'
``T5EncoderModel`` (google/t5-v1_1-*) and ``CLIPTextModel``
(openai/clip-vit-large-patch14) with weight converters, so the full
denoise graph — text encode -> MMDiT -> VAE — is XLA programs end to end.

Numerics are pinned by random-weight oracle tests against transformers on
CPU (tests/test_text_encoder_oracle.py): <1e-4 fp32 max-abs-diff.

Architecture notes (what the oracle forces us to match exactly):
- T5: RMSNorm without mean-centering (fp32 accumulation), NO sqrt(d)
  attention scaling, bucketed relative-position bias computed in layer 0
  and shared by all layers, gated-GELU feed-forward (tanh approximation),
  no biases anywhere, token embeddings unscaled.
- CLIP text: learned absolute positions, pre-LN blocks, causal mask,
  quick_gelu, scaled dot-product attention with biases; pooled output is
  the final-LN hidden state at ``argmax(input_ids)`` — the legacy
  eos_token_id==2 path transformers takes for the FLUX CLIP checkpoint
  (endoftext = the vocabulary's max id).

Tokenization stays host-side (string processing is not accelerator work);
the encoder forward is the on-chip part.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.ops.precision import dot_precision


# ----------------------------------------------------------------------------
# T5 v1.1 encoder
# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def t5_xxl_config() -> T5Config:
    """google/t5-v1_1-xxl — the FLUX text_encoder_2."""
    return T5Config()


def _rms_norm(x, weight, eps):
    # T5LayerNorm: variance in fp32, no mean subtraction, weight in the
    # model dtype applied after the cast back.
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * weight.astype(x.dtype)


def _gelu_new(x):
    # transformers NewGELUActivation (tanh approximation) — what v1.1's
    # gated-gelu uses. Python-float constant: a numpy scalar would be
    # strongly typed and silently promote bf16 activations to fp32.
    c = float(np.sqrt(2.0 / np.pi))
    x3 = x + 0.044715 * x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(c * x3))


def t5_relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional bucketing, exact port of transformers
    `T5Attention._relative_position_bucket`."""
    num_buckets //= 2
    buckets = jnp.where(relative_position > 0, num_buckets, 0)
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    # log-spaced buckets for larger distances (computed in fp32)
    rel_if_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_if_large)


def _t5_position_bias(params, cfg: T5Config, length: int) -> jnp.ndarray:
    """(1, heads, q, k) bias from layer-0's shared embedding table."""
    ctx = jnp.arange(length)[:, None]
    mem = jnp.arange(length)[None, :]
    buckets = t5_relative_position_bucket(
        mem - ctx,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    table = params["relative_attention_bias"]  # (num_buckets, heads)
    return table[buckets].transpose(2, 0, 1)[None]  # (1, H, q, k)


def _t5_attention(p, x, bias, cfg: T5Config, mask):
    b, n, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv

    def proj(name):
        w = p[name]["kernel"].astype(x.dtype)
        y = jnp.einsum("bnd,df->bnf", x, w, precision=dot_precision(x, w))
        return y.reshape(b, n, h, dk).transpose(0, 2, 1, 3)

    q = proj("q")
    k = proj("k")
    v = proj("v")
    # T5 does NOT scale by 1/sqrt(d_kv).
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = scores + jnp.where(
            mask[:, None, None, :], 0.0, -1e9
        ).astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     precision=dot_precision(attn, v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, h * dk)
    wo = p["o"]["kernel"].astype(x.dtype)
    return jnp.einsum("bnf,fd->bnd", ctx, wo,
                      precision=dot_precision(ctx, wo))


def t5_encode(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: T5Config,
    attention_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """input_ids (B, L) int32 -> last_hidden_state (B, L, d_model).

    Matches transformers `T5EncoderModel.forward` (eval, no dropout).
    """
    x = params["embedding"][input_ids].astype(compute_dtype)
    bias = _t5_position_bias(
        params["layers"][0]["attention"], cfg, input_ids.shape[1]
    )
    for layer in params["layers"]:
        a = layer["attention"]
        h = _rms_norm(x, a["layer_norm"], cfg.layer_norm_epsilon)
        x = x + _t5_attention(a, h, bias, cfg, attention_mask)
        f = layer["ff"]
        h = _rms_norm(x, f["layer_norm"], cfg.layer_norm_epsilon)
        wi0 = f["wi_0"]["kernel"].astype(h.dtype)
        wi1 = f["wi_1"]["kernel"].astype(h.dtype)
        gate = _gelu_new(
            jnp.einsum("bnd,df->bnf", h, wi0, precision=dot_precision(h, wi0))
        )
        up = jnp.einsum("bnd,df->bnf", h, wi1,
                        precision=dot_precision(h, wi1))
        hidden = gate * up
        wo = f["wo"]["kernel"].astype(h.dtype)
        x = x + jnp.einsum("bnf,fd->bnd", hidden, wo,
                           precision=dot_precision(hidden, wo))
    return _rms_norm(x, params["final_layer_norm"], cfg.layer_norm_epsilon)


def init_t5_params(key: jax.Array, cfg: T5Config) -> dict:
    """Random init with transformers' T5 scheme (factor=1.0 normal init);
    used by tests and the stub-weight factory receipt."""
    rng = np.random.default_rng(
        int(np.asarray(jax.random.key_data(key)).sum()) % (2**31)
    )

    def nrm(shape, std):
        return jnp.asarray(rng.normal(0.0, std, shape), jnp.float32)

    d, dk, h, ff = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff
    layers = []
    for i in range(cfg.num_layers):
        att = {
            "layer_norm": jnp.ones((d,), jnp.float32),
            "q": {"kernel": nrm((d, h * dk), (d * dk) ** -0.5)},
            "k": {"kernel": nrm((d, h * dk), d**-0.5)},
            "v": {"kernel": nrm((d, h * dk), d**-0.5)},
            "o": {"kernel": nrm((h * dk, d), (h * dk) ** -0.5)},
        }
        if i == 0:
            att["relative_attention_bias"] = nrm(
                (cfg.relative_attention_num_buckets, h), d**-0.5
            )
        layers.append({
            "attention": att,
            "ff": {
                "layer_norm": jnp.ones((d,), jnp.float32),
                "wi_0": {"kernel": nrm((d, ff), d**-0.5)},
                "wi_1": {"kernel": nrm((d, ff), d**-0.5)},
                "wo": {"kernel": nrm((ff, d), ff**-0.5)},
            },
        })
    return {
        "embedding": nrm((cfg.vocab_size, d), 1.0),
        "layers": layers,
        "final_layer_norm": jnp.ones((d,), jnp.float32),
    }


def convert_t5_encoder(state_dict, cfg: T5Config) -> dict:
    """transformers `T5EncoderModel.state_dict()` -> our pytree.

    Accepts torch tensors or numpy arrays. Linear weights transpose from
    torch's (out, in) to our (in, out).
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}

    def lin(name):
        return {"kernel": jnp.asarray(sd[name].T)}

    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        att = {
            "layer_norm": jnp.asarray(sd[f"{pre}.0.layer_norm.weight"]),
            "q": lin(f"{pre}.0.SelfAttention.q.weight"),
            "k": lin(f"{pre}.0.SelfAttention.k.weight"),
            "v": lin(f"{pre}.0.SelfAttention.v.weight"),
            "o": lin(f"{pre}.0.SelfAttention.o.weight"),
        }
        if i == 0:
            att["relative_attention_bias"] = jnp.asarray(
                sd[f"{pre}.0.SelfAttention.relative_attention_bias.weight"]
            )
        layers.append({
            "attention": att,
            "ff": {
                "layer_norm": jnp.asarray(sd[f"{pre}.1.layer_norm.weight"]),
                "wi_0": lin(f"{pre}.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{pre}.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{pre}.1.DenseReluDense.wo.weight"),
            },
        })
    return {
        "embedding": jnp.asarray(sd["shared.weight"]),
        "layers": layers,
        "final_layer_norm": jnp.asarray(sd["encoder.final_layer_norm.weight"]),
    }


# ----------------------------------------------------------------------------
# CLIP text model (pooled output)
# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


def clip_l_config() -> CLIPTextConfig:
    """openai/clip-vit-large-patch14 text tower — the FLUX text_encoder."""
    return CLIPTextConfig()


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _clip_attention(p, x, cfg: CLIPTextConfig, causal_bias):
    b, n, d = x.shape
    h = cfg.num_heads
    dk = d // h

    def proj(name):
        w = p[name]["kernel"].astype(x.dtype)
        y = jnp.einsum("bnd,df->bnf", x, w, precision=dot_precision(x, w))
        y = y + p[name]["bias"].astype(x.dtype)
        return y.reshape(b, n, h, dk).transpose(0, 2, 1, 3)

    q = proj("q") * (dk**-0.5)
    k = proj("k")
    v = proj("v")
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = scores + causal_bias
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     precision=dot_precision(attn, v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    w = p["out"]["kernel"].astype(x.dtype)
    return (jnp.einsum("bnd,df->bnf", ctx, w, precision=dot_precision(ctx, w))
            + p["out"]["bias"].astype(x.dtype))


def _layer_norm(x, p, eps):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def clip_text_encode(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: CLIPTextConfig,
    compute_dtype=jnp.float32,
):
    """input_ids (B, L) int32 -> (last_hidden_state (B, L, D), pooled (B, D)).

    Pooled = final-LN hidden at argmax(input_ids) — transformers' legacy
    eos_token_id==2 path, correct for the FLUX CLIP checkpoint because
    endoftext (49407) is the max vocabulary id.
    """
    b, n = input_ids.shape
    x = params["token_embedding"][input_ids].astype(compute_dtype)
    x = x + params["position_embedding"][:n].astype(compute_dtype)
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
    for layer in params["layers"]:
        h = _layer_norm(x, layer["ln1"], cfg.layer_norm_eps)
        x = x + _clip_attention(layer["attn"], h, cfg, causal)
        h = _layer_norm(x, layer["ln2"], cfg.layer_norm_eps)
        w1 = layer["mlp"]["fc1"]["kernel"].astype(h.dtype)
        h = _quick_gelu(
            jnp.einsum("bnd,df->bnf", h, w1, precision=dot_precision(h, w1))
            + layer["mlp"]["fc1"]["bias"].astype(h.dtype)
        )
        w2 = layer["mlp"]["fc2"]["kernel"].astype(h.dtype)
        x = x + (
            jnp.einsum("bnf,fd->bnd", h, w2, precision=dot_precision(h, w2))
            + layer["mlp"]["fc2"]["bias"].astype(h.dtype)
        )
    x = _layer_norm(x, params["final_layer_norm"], cfg.layer_norm_eps)
    pooled = x[jnp.arange(b), jnp.argmax(input_ids, axis=-1)]
    return x, pooled


def init_clip_text_params(key: jax.Array, cfg: CLIPTextConfig) -> dict:
    rng = np.random.default_rng(
        int(np.asarray(jax.random.key_data(key)).sum()) % (2**31)
    )
    d, ff = cfg.hidden_size, cfg.intermediate_size

    def nrm(shape, std=0.02):
        return jnp.asarray(rng.normal(0.0, std, shape), jnp.float32)

    def lin(cin, cout):
        return {"kernel": nrm((cin, cout)), "bias": jnp.zeros((cout,))}

    def ln():
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    layers = [
        {
            "ln1": ln(),
            "attn": {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                     "out": lin(d, d)},
            "ln2": ln(),
            "mlp": {"fc1": lin(d, ff), "fc2": lin(ff, d)},
        }
        for _ in range(cfg.num_layers)
    ]
    return {
        "token_embedding": nrm((cfg.vocab_size, d)),
        "position_embedding": nrm((cfg.max_position_embeddings, d)),
        "layers": layers,
        "final_layer_norm": ln(),
    }


def convert_clip_text(state_dict, cfg: CLIPTextConfig) -> dict:
    """transformers `CLIPTextModel.state_dict()` -> our pytree."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}

    def lin(name):
        return {"kernel": jnp.asarray(sd[f"{name}.weight"].T),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    def ln(name):
        return {"weight": jnp.asarray(sd[f"{name}.weight"]),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    layers = []
    for i in range(cfg.num_layers):
        pre = f"text_model.encoder.layers.{i}"
        layers.append({
            "ln1": ln(f"{pre}.layer_norm1"),
            "attn": {
                "q": lin(f"{pre}.self_attn.q_proj"),
                "k": lin(f"{pre}.self_attn.k_proj"),
                "v": lin(f"{pre}.self_attn.v_proj"),
                "out": lin(f"{pre}.self_attn.out_proj"),
            },
            "ln2": ln(f"{pre}.layer_norm2"),
            "mlp": {"fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2")},
        })
    return {
        "token_embedding": jnp.asarray(
            sd["text_model.embeddings.token_embedding.weight"]
        ),
        "position_embedding": jnp.asarray(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "layers": layers,
        "final_layer_norm": ln("text_model.final_layer_norm"),
    }
