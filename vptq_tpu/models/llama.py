"""Llama-family decoder stack (Llama 2/3, Qwen2/2.5, Mistral).

The reference delegates the model graph to HF transformers and only
swaps linears (reference: vptq/layers/model_base.py:33-53). Here the
decoder is our own functional JAX implementation — RMSNorm, RoPE, GQA
attention and SwiGLU with all seven projections as quantized or dense
linears — so the whole forward stays inside one jit/pjit region with
static shapes and a functional KV cache.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.vqlinear import VQLinear

Linear = Union[VQLinear, DenseLinear]

__all__ = [
    "ModelConfig",
    "Block",
    "Model",
    "KVCache",
    "MoeMlp",
    "init_cache",
]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture config, parsed from HF ``config.json``."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None
    tie_word_embeddings: bool = False
    model_type: str = "llama"
    # qwen2-style qkv bias (model config attention_bias / qkv_bias)
    attention_bias: bool = False
    # sparse MoE (mixtral-style); 0 experts => dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 0
    # sliding-window attention width; None = full causal (mistral/qwen
    # checkpoints may set this — decode masks cache reads beyond it)
    sliding_window: Optional[int] = None

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        heads = d["num_attention_heads"]
        rope_scaling = d.get("rope_scaling")
        if rope_scaling is not None:
            rope_scaling = tuple(sorted(rope_scaling.items()))
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads", heads),
            head_dim=d.get("head_dim", d["hidden_size"] // heads),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            model_type=d.get("model_type", "llama"),
            attention_bias=d.get(
                "attention_bias", d.get("qkv_bias", False)
            ),
            sliding_window=(
                d.get("sliding_window")
                if d.get("use_sliding_window", True)
                else None
            ),
            num_local_experts=d.get("num_local_experts", 0),
            num_experts_per_tok=d.get("num_experts_per_tok", 0),
        )


# --------------------------------------------------------------------
# RoPE
# --------------------------------------------------------------------


def rope_frequencies(cfg: ModelConfig) -> jnp.ndarray:
    """Per-pair inverse frequencies, with llama3-style scaling."""
    dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    scaling = dict(cfg.rope_scaling) if cfg.rope_scaling else None
    if scaling and scaling.get("rope_type", scaling.get("type")) == "llama3":
        factor = scaling["factor"]
        low_factor = scaling["low_freq_factor"]
        high_factor = scaling["high_freq_factor"]
        old_len = scaling["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * jnp.pi / inv_freq
        smooth = (old_len / wavelen - low_factor) / (
            high_factor - low_factor
        )
        scaled = jnp.where(
            wavelen > low_wavelen,
            inv_freq / factor,
            jnp.where(
                wavelen < high_wavelen,
                inv_freq,
                (1 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    return inv_freq


def apply_rope(
    x: jnp.ndarray,  # (B, S, H, D)
    positions: jnp.ndarray,  # (B, S)
    inv_freq: jnp.ndarray,  # (D/2,)
) -> jnp.ndarray:
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B,S,D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    )
    return (norm * weight.astype(jnp.float32)).astype(x.dtype)


# --------------------------------------------------------------------
# Parameter pytrees
# --------------------------------------------------------------------


@struct.dataclass
class Attention:
    q_proj: Optional[Linear]
    k_proj: Optional[Linear]
    v_proj: Optional[Linear]
    o_proj: Linear
    # fused q|k|v projection (one matmul, split after) — built by
    # vptq_tpu.layers.runtime.fuse_model; when set, q/k/v are None.
    qkv_proj: Optional[Linear] = None


@struct.dataclass
class Mlp:
    gate_proj: Optional[Linear]
    up_proj: Optional[Linear]
    down_proj: Linear
    # fused gate|up projection
    gate_up_proj: Optional[Linear] = None


@struct.dataclass
class MoeMlp:
    """Mixtral-style sparse MoE block: softmax router + top-k experts.

    Correctness-first evaluation: every expert runs on every token and
    is mixed by its (zeroed outside top-k) routing weight — numerically
    identical to gather/scatter routing and shape-static for XLA. The
    decode fast path (dynamic-slice only the selected experts) is a
    planned optimization.
    """

    router: Linear  # hidden -> num_experts
    experts: Tuple[Mlp, ...]
    num_experts_per_tok: int = struct.field(
        pytree_node=False, default=2
    )


@struct.dataclass
class Block:
    input_layernorm: jnp.ndarray
    attn: Attention
    post_attention_layernorm: jnp.ndarray
    mlp: Union[Mlp, MoeMlp]


@struct.dataclass
class Model:
    embed_tokens: jnp.ndarray  # (vocab, hidden)
    blocks: Tuple[Block, ...]
    norm: jnp.ndarray
    lm_head: Optional[Linear]  # None => tied to embed_tokens
    cfg: ModelConfig = struct.field(pytree_node=False, default=None)


@struct.dataclass
class KVCache:
    """Functional KV cache: preallocated, updated with dynamic slices.

    ``lengths`` is per-sequence — slots in a serving batch advance
    independently (continuous batching, vptq_tpu/serving/scheduler.py).
    """

    k: jnp.ndarray  # (layers, B, max_seq, kv_heads, head_dim)
    v: jnp.ndarray
    lengths: jnp.ndarray  # (B,) int32 — tokens cached per sequence


def init_cache(
    cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_seq,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


# --------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------


def _attention(
    block_idx: int,
    attn: Attention,
    x: jnp.ndarray,  # (B, S, hidden)
    positions: jnp.ndarray,  # (B, S)
    inv_freq: jnp.ndarray,
    cache: KVCache,
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, KVCache]:
    batch, seq, _ = x.shape
    nh, nkv, hd = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )

    if attn.qkv_proj is not None:
        qkv = attn.qkv_proj(x)
        q, k, v = jnp.split(
            qkv, [nh * hd, (nh + nkv) * hd], axis=-1
        )
        q = q.reshape(batch, seq, nh, hd)
        k = k.reshape(batch, seq, nkv, hd)
        v = v.reshape(batch, seq, nkv, hd)
    else:
        q = attn.q_proj(x).reshape(batch, seq, nh, hd)
        k = attn.k_proj(x).reshape(batch, seq, nkv, hd)
        v = attn.v_proj(x).reshape(batch, seq, nkv, hd)

    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)

    # insert into cache at each sequence's own offset
    offsets = cache.lengths  # (B,)

    # per-row dynamic start along the sequence axis
    k_cache = jax.vmap(
        lambda buf, new, off: jax.lax.dynamic_update_slice(
            buf, new, (off, 0, 0)
        )
    )(cache.k[block_idx], k.astype(cache.k.dtype), offsets)
    v_cache = jax.vmap(
        lambda buf, new, off: jax.lax.dynamic_update_slice(
            buf, new, (off, 0, 0)
        )
    )(cache.v[block_idx], v.astype(cache.v.dtype), offsets)
    new_cache = KVCache(
        k=cache.k.at[block_idx].set(k_cache),
        v=cache.v.at[block_idx].set(v_cache),
        lengths=cache.lengths,  # bumped once per step by the caller
    )

    max_seq = k_cache.shape[1]
    group = nh // nkv
    # (B, kv, group, S, D)
    qg = q.reshape(batch, seq, nkv, group, hd).transpose(0, 2, 3, 1, 4)
    kT = k_cache.transpose(0, 2, 3, 1)  # (B, kv, D, T)
    scores = jnp.einsum(
        "bkgsd,bkdt->bkgst", qg.astype(jnp.float32),
        kT.astype(jnp.float32),
    ) / jnp.sqrt(hd).astype(jnp.float32)

    # causal + validity mask over cache positions (per sequence)
    t_ids = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = (
        offsets[:, None] + jnp.arange(seq)[None, :]
    )[:, None, None, :, None]
    mask = t_ids <= q_pos
    if cfg.sliding_window is not None:
        mask = jnp.logical_and(
            mask, t_ids > q_pos - cfg.sliding_window
        )
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum(
        "bkgst,btkd->bkgsd", probs, v_cache.astype(jnp.float32)
    )
    out = out.transpose(0, 3, 1, 2, 4).reshape(batch, seq, nh * hd)
    return attn.o_proj(out.astype(x.dtype)), new_cache


def _moe_mlp(moe: MoeMlp, x: jnp.ndarray) -> jnp.ndarray:
    # router in fp32 (HF MixtralSparseMoeBlock does the same)
    logits = moe.router(x).astype(jnp.float32)  # (..., E)
    k = moe.num_experts_per_tok
    top_w, top_ids = jax.lax.top_k(logits, k)
    top_w = jax.nn.softmax(top_w, axis=-1)  # normalize over top-k
    num_experts = len(moe.experts)
    # scatter normalized weights back to a dense (..., E) mix tensor
    mix = jnp.sum(
        jax.nn.one_hot(top_ids, num_experts, dtype=jnp.float32)
        * top_w[..., None],
        axis=-2,
    )
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for e, expert in enumerate(moe.experts):
        out = out + mix[..., e: e + 1] * _mlp(expert, x).astype(
            jnp.float32
        )
    return out.astype(x.dtype)


def _mlp(mlp, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(mlp, MoeMlp):
        return _moe_mlp(mlp, x)
    if mlp.gate_up_proj is not None:
        gu = mlp.gate_up_proj(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return mlp.down_proj(jax.nn.silu(gate) * up)
    return mlp.down_proj(jax.nn.silu(mlp.gate_proj(x)) * mlp.up_proj(x))


def forward(
    model: Model,
    tokens: jnp.ndarray,  # (B, S) int32
    cache: KVCache,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder over ``tokens`` starting at ``cache.lengths``.

    Returns (logits (B, S, vocab) fp32, updated cache).
    """
    cfg = model.cfg
    batch, seq = tokens.shape
    x = model.embed_tokens[tokens].astype(dtype)
    positions = (
        cache.lengths[:, None]
        + jnp.arange(seq)[None, :].astype(jnp.int32)
    )
    inv_freq = rope_frequencies(cfg)

    for i, block in enumerate(model.blocks):
        h = rms_norm(x, block.input_layernorm, cfg.rms_norm_eps)
        attn_out, cache = _attention(
            i, block.attn, h, positions, inv_freq, cache, cfg
        )
        x = x + attn_out
        h = rms_norm(x, block.post_attention_layernorm, cfg.rms_norm_eps)
        x = x + _mlp(block.mlp, h)

    x = rms_norm(x, model.norm, cfg.rms_norm_eps)
    if model.lm_head is not None:
        logits = model.lm_head(x)
    else:
        logits = jnp.dot(
            x,
            model.embed_tokens.T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    cache = KVCache(
        k=cache.k, v=cache.v, lengths=cache.lengths + seq
    )
    return logits.astype(jnp.float32), cache
