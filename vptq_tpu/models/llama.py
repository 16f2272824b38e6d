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
    max_position_embeddings: int = 4096
    # --- DeepSeek-V2/V3 MLA + fine-grained MoE -----------------------
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    rope_interleave: bool = False
    moe_intermediate_size: int = 0
    n_routed_experts: int = 0
    n_shared_experts: int = 0
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    first_k_dense_replace: int = 0
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
            max_position_embeddings=d.get(
                "max_position_embeddings", 4096
            ),
            q_lora_rank=d.get("q_lora_rank"),
            kv_lora_rank=d.get("kv_lora_rank") or 0,
            qk_nope_head_dim=d.get("qk_nope_head_dim", 0),
            qk_rope_head_dim=d.get("qk_rope_head_dim", 0),
            v_head_dim=d.get("v_head_dim", 0),
            rope_interleave=d.get("rope_interleave", False),
            moe_intermediate_size=d.get("moe_intermediate_size", 0),
            n_routed_experts=d.get("n_routed_experts") or 0,
            n_shared_experts=d.get("n_shared_experts") or 0,
            n_group=d.get("n_group") or 1,
            topk_group=d.get("topk_group") or 1,
            norm_topk_prob=d.get("norm_topk_prob", True),
            routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
            first_k_dense_replace=d.get("first_k_dense_replace", 0),
        )

    # --- MLA (DeepSeek) derived geometry -----------------------------

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def cache_k_dim(self) -> int:
        # MLA caches the COMPRESSED latent (+ the shared rope key),
        # not per-head expansions — DeepSeek's defining memory
        # advantage (~71x smaller than expanded per-head KV at R1
        # geometry). Attention runs in latent space with the kv_b
        # up-projections absorbed into q and output (MlaAttention.uk/
        # .uv); see _mla_attention.
        if self.is_mla:
            return self.kv_lora_rank + self.qk_rope_head_dim
        return self.head_dim

    @property
    def cache_v_dim(self) -> int:
        # the latent again (the value head reads the same vector; a
        # further ~1.9x is available by aliasing it onto the k cache)
        return self.kv_lora_rank if self.is_mla else self.head_dim

    @property
    def rope_dim(self) -> int:
        return self.qk_rope_head_dim if self.is_mla else self.head_dim


# --------------------------------------------------------------------
# RoPE
# --------------------------------------------------------------------


def rope_frequencies(cfg: ModelConfig) -> Tuple[jnp.ndarray, float]:
    """(per-pair inverse frequencies, cos/sin attention scaling).

    Supports default, llama3 and yarn (DeepSeek) scaling — semantics of
    HF transformers' ROPE_INIT_FUNCTIONS.
    """
    import math

    dim = cfg.rope_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    attention_scaling = 1.0
    scaling = dict(cfg.rope_scaling) if cfg.rope_scaling else None
    if scaling and scaling.get("rope_type", scaling.get("type")) == "yarn":
        factor = scaling["factor"]
        beta_fast = scaling.get("beta_fast") or 32
        beta_slow = scaling.get("beta_slow") or 1
        mscale = scaling.get("mscale")
        mscale_all_dim = scaling.get("mscale_all_dim")
        orig_max = (
            scaling.get("original_max_position_embeddings")
            or cfg.max_position_embeddings
        )

        def get_mscale(scale, m=1):
            if scale <= 1:
                return 1.0
            return 0.1 * m * math.log(scale) + 1.0

        attention_scaling = scaling.get("attention_factor")
        if attention_scaling is None:
            if mscale and mscale_all_dim:
                attention_scaling = float(
                    get_mscale(factor, mscale)
                    / get_mscale(factor, mscale_all_dim)
                )
            else:
                attention_scaling = get_mscale(factor)

        def correction_dim(rot):
            return (
                dim
                * math.log(orig_max / (rot * 2 * math.pi))
                / (2 * math.log(cfg.rope_theta))
            )

        low = max(math.floor(correction_dim(beta_fast)), 0)
        high = min(math.ceil(correction_dim(beta_slow)), dim - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(dim // 2, dtype=jnp.float32) - low)
            / (high - low),
            0,
            1,
        )
        extrapolation_factor = 1.0 - ramp
        inv_freq = (
            inv_freq / factor * (1 - extrapolation_factor)
            + inv_freq * extrapolation_factor
        )
    elif scaling and scaling.get(
        "rope_type", scaling.get("type")
    ) == "llama3":
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
    return inv_freq, attention_scaling


def rope_cos_sin(
    positions: jnp.ndarray,  # (B, S)
    inv_freq: jnp.ndarray,  # (D/2,)
    scale: float = 1.0,
):
    """cos/sin tables (B, S, 1, D/2) — computed ONCE per forward and
    shared by every layer (hoisting the trig out of the layer loop)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return (
        jnp.cos(angles)[:, :, None, :] * scale,
        jnp.sin(angles)[:, :, None, :] * scale,
    )


def apply_rope(
    x: jnp.ndarray,  # (B, S, H, D)
    cos: jnp.ndarray,  # (B, S, 1, D/2)
    sin: jnp.ndarray,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Rotary embedding, half-split pairing (HF rotate_half semantics).

    ``interleaved`` deinterleaves pairs (2i, 2i+1) first — DeepSeek
    checkpoints store rope weights interleaved; both q and k undergo
    the same shuffle so dot products are consistent (HF
    apply_rotary_pos_emb_interleave).
    """
    if interleaved:
        b, s, h, d = x.shape
        x = x.reshape(b, s, h, d // 2, 2).transpose(0, 1, 2, 4, 3)
        x = x.reshape(b, s, h, d)
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
class StackedExperts:
    """Stacked int8 expert weights for the MoE decode fast path.

    Built by ``runtime.fuse_model`` when every expert is an Int8Linear
    pair (fused gate|up + down). Decode then computes only the top-k
    selected experts per token, reading ONLY their bytes from HBM via
    a scalar-prefetch Pallas kernel (``w8_matmul_expert``) — the dense
    fallback streams all E experts every step.
    """

    gate_up_wq: jnp.ndarray  # (E, 2*inter, hidden_p) int8 (int4: packed /2)
    gate_up_scales: jnp.ndarray  # (E, G1, 2*inter) f32 (int4: (E,S,2*inter) bf16)
    down_wq: jnp.ndarray  # (E, hidden, inter_p) int8 (int4: packed /2)
    down_scales: jnp.ndarray  # (E, G2, hidden) f32 (int4: (E,S,hidden) bf16)
    fmt: str = struct.field(pytree_node=False, default="int8")


@struct.dataclass
class MoeMlp:
    """Mixtral-style sparse MoE block: softmax router + top-k experts.

    Prefill evaluates every expert on every token mixed by its (zeroed
    outside top-k) routing weight — numerically identical to
    gather/scatter routing and shape-static for XLA. Decode with few
    tokens takes the selected-experts fast path when ``stacked`` is
    present (see :class:`StackedExperts`).

    ``experts`` may be empty when ``stacked`` is present —
    ``runtime.fuse_model`` drops the per-expert copies so expert
    weights exist ONCE in HBM; both prefill and decode then read the
    stacked arrays. ``ep_mesh``/``ep_axis`` (set by
    ``parallel.shard_model``) switch the forward to expert-parallel
    dispatch: stacked weights sharded over the mesh axis, each device
    computing only its local experts, outputs psum-combined.
    """

    router: Linear  # hidden -> num_experts
    experts: Tuple[Mlp, ...]
    num_experts_per_tok: int = struct.field(
        pytree_node=False, default=2
    )
    stacked: Optional[StackedExperts] = None
    ep_mesh: Optional[Any] = struct.field(
        pytree_node=False, default=None
    )
    ep_axis: str = struct.field(pytree_node=False, default="model")


@struct.dataclass
class MlaAttention:
    """DeepSeek-V2/V3 multi-head latent attention parameters.

    Layout mirrors the HF module (modeling_deepseek_v3.py
    DeepseekV3Attention): optional low-rank q path, compressed kv with
    a shared rope head, per-head nope/value expansion.
    """

    kv_a_proj: Linear  # kv_a_proj_with_mqa
    kv_a_norm: jnp.ndarray
    kv_b_proj: Optional[Linear]  # None once absorbed into uk/uv
    o_proj: Linear
    q_proj: Optional[Linear] = None  # when q_lora_rank is None
    q_a_proj: Optional[Linear] = None
    q_a_norm: Optional[jnp.ndarray] = None
    q_b_proj: Optional[Linear] = None
    # kv_b up-projections absorbed for latent-space attention
    # (loader.absorb_mla): uk (kv_lora, nh, qk_nope), uv (kv_lora,
    # nh, v_head) — score(q,h,t) = (q_nope@uk_h)·c_t + q_rot·k_rot,
    # out_h = (Σ p_t c_t)@uv_h. Exact reassociation of the
    # expanded-KV math.
    uk: Optional[jnp.ndarray] = None
    uv: Optional[jnp.ndarray] = None


@struct.dataclass
class DeepseekMoe:
    """DeepSeek-V3 fine-grained MoE: sigmoid scores with correction
    bias, group-limited top-k routing, shared experts
    (HF DeepseekV3TopkRouter/DeepseekV3MoE semantics)."""

    router_weight: jnp.ndarray  # (E, hidden) f32
    correction_bias: jnp.ndarray  # (E,) f32
    experts: Tuple[Mlp, ...]
    shared_experts: Mlp
    top_k: int = struct.field(pytree_node=False, default=8)
    n_group: int = struct.field(pytree_node=False, default=1)
    topk_group: int = struct.field(pytree_node=False, default=1)
    norm_topk_prob: bool = struct.field(pytree_node=False, default=True)
    routed_scaling_factor: float = struct.field(
        pytree_node=False, default=1.0
    )
    stacked: Optional[StackedExperts] = None
    ep_mesh: Optional[Any] = struct.field(
        pytree_node=False, default=None
    )
    ep_axis: str = struct.field(pytree_node=False, default="model")


@struct.dataclass
class Block:
    input_layernorm: jnp.ndarray
    attn: Union[Attention, MlaAttention]
    post_attention_layernorm: jnp.ndarray
    mlp: Union[Mlp, MoeMlp, DeepseekMoe]


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

    ``k``/``v`` are per-layer tuples (NOT one stacked array): a decode
    step updates one layer at a time, and with a stacked layout every
    ``cache.at[layer].set`` lowers to a gather + full-layer copy +
    scatter inside the scan — measured ~1.1 ms/step of pure cache
    shuffling at 7B. Per-layer buffers update in place.

    ``lengths`` is per-sequence — slots in a serving batch advance
    independently (continuous batching, vptq_tpu/serving/scheduler.py).
    """

    k: Tuple[jnp.ndarray, ...]  # per layer: (B, max_seq, kv_heads, hd)
    v: Tuple[jnp.ndarray, ...]
    lengths: jnp.ndarray  # (B,) int32 — tokens cached per sequence


def init_cache(
    cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> KVCache:
    # MLA caches one shared latent "head" (see cache_k_dim)
    kv_heads = 1 if cfg.is_mla else cfg.num_key_value_heads
    base = (batch, max_seq, kv_heads)
    return KVCache(
        k=tuple(
            jnp.zeros(base + (cfg.cache_k_dim,), dtype)
            for _ in range(cfg.num_hidden_layers)
        ),
        v=tuple(
            jnp.zeros(base + (cfg.cache_v_dim,), dtype)
            for _ in range(cfg.num_hidden_layers)
        ),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


# --------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------


def _flash_enabled() -> bool:
    """Fused flash-attention prefill (jax.experimental.pallas TPU op).

    ON by default for fresh prefills of >= _FLASH_MIN_SEQ tokens
    (cache offset 0, standard attention, no sliding window); disable
    with VPTQ_TPU_FLASH=0. Measured on a v5e at 7B geometry
    (examples/flash_prefill_bench.py): below 1024 tokens XLA's fused
    dense-mask attention is faster (0.03 ms vs 0.15 ms per layer at
    512 — the pallas kernel has fixed overhead); at 1024 flash wins
    14% (0.52 vs 0.60 ms) and at 2048 19% (1.97 vs 2.34 ms), in bf16
    with no fp32 casts (the fp32 casts were why round 1 measured
    flash slower).
    """
    import os

    import jax

    return (
        os.environ.get("VPTQ_TPU_FLASH", "1") != "0"
        and jax.default_backend() == "tpu"
    )


_FLASH_MIN_SEQ = 1024


def _attention(
    block_idx: int,
    attn: Attention,
    x: jnp.ndarray,  # (B, S, hidden)
    cos: jnp.ndarray,  # (B, S, 1, D/2) — shared rope tables
    sin: jnp.ndarray,
    cache: KVCache,
    cfg: ModelConfig,
    fresh_prefill: bool = False,
    tp: Optional[Tuple[str, int]] = None,
    cp: Optional[Tuple[str, int]] = None,  # ring prefill, see forward
) -> Tuple[jnp.ndarray, KVCache]:
    batch, seq, _ = x.shape
    nh, nkv, hd = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    if tp is not None:
        # shard_map tensor parallelism (parallel/tp.py): this device
        # computes its local heads; o_proj is row-parallel and the
        # partial outputs are summed over the mesh axis below.
        nh //= tp[1]
        nkv //= tp[1]

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

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cp is not None:
        # context parallelism (fresh prefill): the sequence is
        # sharded over cp[0]; attention runs as a ppermute ring over
        # the K/V chunks (parallel/ring.py) and the gathered prefix
        # is written once into the (data-replicated) cache
        if cfg.sliding_window is not None:
            raise NotImplementedError(
                "sliding-window attention under context parallelism"
            )
        from vptq_tpu.parallel.ring import ring_attention

        out = ring_attention(q, k, v, cp[0], cp[1], hd ** -0.5)
        k_all = jax.lax.all_gather(k, cp[0], axis=1, tiled=True)
        v_all = jax.lax.all_gather(v, cp[0], axis=1, tiled=True)
        new_cache = _insert_kv(block_idx, k_all, v_all, cache)
        out = out.reshape(batch, seq, nh * hd)
        return (
            _row_parallel_out(attn.o_proj, out, x.dtype, tp),
            new_cache,
        )

    if (
        fresh_prefill
        and seq >= _FLASH_MIN_SEQ
        and cfg.sliding_window is None
        and _flash_enabled()
    ):
        # fused causal attention over the fresh chunk only (offset 0);
        # keep the activation dtype — fp32 casts forfeit the MXU's
        # bf16 rate and double the kernel's HBM traffic
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        new_cache = _insert_kv(block_idx, k, v, cache)
        group = nh // nkv
        k_exp = jnp.repeat(k, group, axis=2) if group > 1 else k
        v_exp = jnp.repeat(v, group, axis=2) if group > 1 else v
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k_exp.transpose(0, 2, 1, 3),
            v_exp.transpose(0, 2, 1, 3),
            causal=True,
            sm_scale=hd ** -0.5,
        )
        out = out.transpose(0, 2, 1, 3).reshape(batch, seq, nh * hd)
        return _row_parallel_out(attn.o_proj, out, x.dtype, tp), new_cache

    out, new_cache = _cache_and_attend(
        block_idx, q, k, v, cache, cfg, scale=hd ** -0.5
    )
    return _row_parallel_out(attn.o_proj, out, x.dtype, tp), new_cache


def _row_parallel_out(proj, out, dtype, tp):
    """Apply a row-parallel projection; under shard_map TP, psum the
    partial products over the mesh axis (Megatron-style; the bias of a
    row-parallel layer must live on exactly one shard — enforced at
    placement time in parallel/tp.py)."""
    y = proj(out.astype(dtype))
    if tp is not None:
        y = jax.lax.psum(y, tp[0])
    return y


def _decode_attend_blocks(
    q: jnp.ndarray,  # (B, 1, H, Dk)
    k_cache: jnp.ndarray,  # (B, T, KV, Dk)
    v_cache: jnp.ndarray,  # (B, T, KV, Dv)
    offsets: jnp.ndarray,  # (B,) — new token already inserted at off
    cfg: ModelConfig,
    scale: float,
    block: int = 256,
) -> jnp.ndarray:
    """Single-token attention reading only ceil(len/block) cache blocks.

    Online-softmax accumulation over position blocks inside a
    ``lax.while_loop`` whose trip count is data-dependent — HBM cache
    traffic scales with the live sequence length, not the allocated
    ``max_seq`` (flash-decoding structure, expressed in XLA).
    """
    batch, _, nh, dk = q.shape
    max_seq = k_cache.shape[1]
    nkv = k_cache.shape[2]
    dv = v_cache.shape[3]
    group = nh // nkv
    qf = q[:, 0].astype(jnp.float32)  # (B, H, Dk)
    n_blocks_live = (jnp.max(offsets) + block) // block  # offsets = len-1

    def body(state):
        i, m, s, acc = state
        start = i * block
        kb = jax.lax.dynamic_slice(
            k_cache, (0, start, 0, 0), (batch, block, nkv, dk)
        ).astype(jnp.float32)
        vb = jax.lax.dynamic_slice(
            v_cache, (0, start, 0, 0), (batch, block, nkv, dv)
        ).astype(jnp.float32)
        if group > 1:
            kb = jnp.repeat(kb, group, axis=2)
            vb = jnp.repeat(vb, group, axis=2)
        # scores (B, H, block)
        sc = jnp.einsum("bhd,bthd->bht", qf, kb) * jnp.float32(scale)
        t_ids = start + jnp.arange(block)[None, None, :]
        valid = t_ids <= offsets[:, None, None]
        if cfg.sliding_window is not None:
            valid = jnp.logical_and(
                valid, t_ids > offsets[:, None, None] - cfg.sliding_window
            )
        sc = jnp.where(valid, sc, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1))
        # guard fully-masked blocks (m_new can stay -inf)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(sc - m_safe[..., None])
        p = jnp.where(valid, p, 0.0)
        corr = jnp.where(
            jnp.isfinite(m), jnp.exp(m - m_safe), 0.0
        )
        s = s * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bht,bthd->bhd", p, vb
        )
        return i + 1, m_new, s, acc

    def cond(state):
        return state[0] < n_blocks_live

    m0 = jnp.full((batch, nh), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((batch, nh), jnp.float32)
    acc0 = jnp.zeros((batch, nh, dv), jnp.float32)
    _, m, s, acc = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), m0, s0, acc0)
    )
    del max_seq
    out = acc / (s[..., None] + 1e-30)
    return out.reshape(batch, 1, nh * dv)


def _insert_kv(
    block_idx: int, k: jnp.ndarray, v: jnp.ndarray, cache: KVCache
) -> KVCache:
    """Write new K/V rows at each sequence's offset, in place.

    Decode (seq == 1, the hot path) is ONE batched scatter per buffer:
    row b lands at (b, lengths[b]) — trace size O(1) in batch, and XLA
    scatters in place through the scan-carry alias. Prefill (seq > 1)
    keeps per-row dynamic_update_slice; it is batch-1 in the serving
    path (scheduler prefills each request on its own cache).
    """
    k_cache = cache.k[block_idx]
    v_cache = cache.v[block_idx]
    batch = k.shape[0]
    k = k.astype(k_cache.dtype)
    v = v.astype(v_cache.dtype)
    if k.shape[1] == 1:
        b_idx = jnp.arange(batch)
        k_cache = k_cache.at[b_idx, cache.lengths].set(
            k[:, 0], unique_indices=True, indices_are_sorted=True
        )
        v_cache = v_cache.at[b_idx, cache.lengths].set(
            v[:, 0], unique_indices=True, indices_are_sorted=True
        )
        new_k = (
            cache.k[:block_idx] + (k_cache,) + cache.k[block_idx + 1:]
        )
        new_v = (
            cache.v[:block_idx] + (v_cache,) + cache.v[block_idx + 1:]
        )
        return KVCache(k=new_k, v=new_v, lengths=cache.lengths)
    for b in range(batch):
        # scatter with mode="drop": a bucket-padded chunk whose pad
        # rows land past max_seq must NOT wrap/clamp into earlier
        # cache rows (dynamic_update_slice clamps the start index,
        # silently overwriting valid K/V — the padded tail is
        # garbage either way, but the clamp corrupted real entries)
        pos = cache.lengths[b] + jnp.arange(k.shape[1])
        k_cache = k_cache.at[b, pos].set(
            k[b], mode="drop",
            unique_indices=True, indices_are_sorted=True,
        )
        v_cache = v_cache.at[b, pos].set(
            v[b], mode="drop",
            unique_indices=True, indices_are_sorted=True,
        )
    new_k = cache.k[:block_idx] + (k_cache,) + cache.k[block_idx + 1:]
    new_v = cache.v[:block_idx] + (v_cache,) + cache.v[block_idx + 1:]
    return KVCache(k=new_k, v=new_v, lengths=cache.lengths)


def _cache_and_attend(
    block_idx: int,
    q: jnp.ndarray,  # (B, S, H, Dk)
    k: jnp.ndarray,  # (B, S, KV, Dk)
    v: jnp.ndarray,  # (B, S, KV, Dv)
    cache: KVCache,
    cfg: ModelConfig,
    scale: float,
) -> Tuple[jnp.ndarray, KVCache]:
    """Insert k/v at each sequence's offset and run masked attention.

    Shared by standard GQA and MLA paths (H == KV * group).
    """
    batch, seq, nh, dk = q.shape
    nkv = k.shape[2]
    dv = v.shape[3]
    offsets = cache.lengths  # (B,)

    new_cache = _insert_kv(block_idx, k, v, cache)
    k_cache = new_cache.k[block_idx]
    v_cache = new_cache.v[block_idx]

    max_seq = k_cache.shape[1]
    if seq == 1 and max_seq >= 256 and max_seq % 256 == 0:
        # decode fast path: only read the live prefix of the cache
        out = _decode_attend_blocks(
            q, k_cache, v_cache, offsets, cfg, scale
        )
        return out, new_cache
    group = nh // nkv
    # (B, kv, group, S, D)
    qg = q.reshape(batch, seq, nkv, group, dk).transpose(0, 2, 3, 1, 4)
    kT = k_cache.transpose(0, 2, 3, 1)  # (B, kv, D, T)
    scores = jnp.einsum(
        "bkgsd,bkdt->bkgst", qg.astype(jnp.float32),
        kT.astype(jnp.float32),
    ) * jnp.float32(scale)

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
    out = out.transpose(0, 3, 1, 2, 4).reshape(batch, seq, nh * dv)
    return out, new_cache


def _mla_attention(
    block_idx: int,
    attn: MlaAttention,
    x: jnp.ndarray,  # (B, S, hidden)
    cos: jnp.ndarray,  # (B, S, 1, dr/2) — shared rope tables
    sin: jnp.ndarray,
    cache: KVCache,
    cfg: ModelConfig,
    tp: Optional[Tuple[str, int]] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """DeepSeek MLA forward (HF DeepseekV3Attention semantics) in
    LATENT space: the cache holds the compressed kv latent plus the
    shared rope key (one "head" of kv_lora+dr dims — ~71x smaller
    than expanded per-head KV at R1 geometry). The kv_b
    up-projections are pre-absorbed (loader.absorb_mla): scores are
    (q_nope@uk_h)·c_t + q_rot·k_rot and the per-head output is
    (Σ p_t c_t)@uv_h — an exact reassociation of the expanded math
    (same softmax inputs, same result up to fp rounding).

    Under shard_map TP (``tp``): the compressed projections
    (q_a / kv_a) are replicated — they are shared across heads — and
    the per-head tensors (q / q_b, uk, uv) are column-parallel over
    heads; the latent cache is replicated over the TP axis; o_proj
    is row-parallel (see parallel/tp.py _place_mla)."""
    import math

    batch, seq, _ = x.shape
    nh = cfg.num_attention_heads
    if tp is not None:
        nh //= tp[1]
    dn, dr, dv = (
        cfg.qk_nope_head_dim,
        cfg.qk_rope_head_dim,
        cfg.v_head_dim,
    )
    if attn.uk is None:
        raise ValueError(
            "MlaAttention.uk/.uv missing — load through "
            "models.loader (absorb_mla) before running"
        )

    if attn.q_proj is not None:
        q = attn.q_proj(x)
    else:
        q = attn.q_b_proj(
            rms_norm(attn.q_a_proj(x), attn.q_a_norm, cfg.rms_norm_eps)
        )
    q = q.reshape(batch, seq, nh, dn + dr)
    q_nope, q_rot = jnp.split(q, [dn], axis=-1)

    ckv = attn.kv_a_proj(x)  # (B, S, kv_lora + dr)
    k_pass, k_rot = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
    c = rms_norm(k_pass, attn.kv_a_norm, cfg.rms_norm_eps)
    k_rot = k_rot.reshape(batch, seq, 1, dr)

    q_rot = apply_rope(q_rot, cos, sin, cfg.rope_interleave)
    k_rot = apply_rope(k_rot, cos, sin, cfg.rope_interleave)

    # absorb uk into the query: q_eff·c == q_nope·k_nope
    q_eff = jnp.einsum(
        "bsnd,lnd->bsnl", q_nope, attn.uk.astype(q_nope.dtype),
        preferred_element_type=jnp.float32,
    ).astype(q_nope.dtype)
    q_full = jnp.concatenate([q_eff, q_rot], axis=-1)
    k_lat = jnp.concatenate(
        [c[:, :, None, :], k_rot.astype(c.dtype)], axis=-1
    )
    v_lat = c[:, :, None, :]

    # softmax scaling with yarn mscale (DeepseekV3Attention.__init__)
    scale = cfg.qk_head_dim ** -0.5
    scaling = dict(cfg.rope_scaling) if cfg.rope_scaling else None
    if scaling is not None:
        mscale_all_dim = scaling.get("mscale_all_dim", 0) or 0
        factor = scaling.get("factor", 1.0)
        if mscale_all_dim and factor > 1:
            mscale = 0.1 * mscale_all_dim * math.log(factor) + 1.0
            scale = scale * mscale * mscale

    out_lat, new_cache = _cache_and_attend(
        block_idx, q_full, k_lat, v_lat, cache, cfg, scale=scale
    )
    out_lat = out_lat.reshape(batch, seq, nh, cfg.kv_lora_rank)
    out = jnp.einsum(
        "bsnl,lnv->bsnv", out_lat, attn.uv.astype(out_lat.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(batch, seq, nh * dv)
    return _row_parallel_out(attn.o_proj, out, x.dtype, tp), new_cache


def _deepseek_moe(
    moe: DeepseekMoe,
    x: jnp.ndarray,
    tp: Optional[Tuple[str, int]] = None,
) -> jnp.ndarray:
    """Sigmoid scores + correction-bias group-limited top-k routing
    (HF DeepseekV3TopkRouter.get_topk_indices semantics)."""
    lead = x.shape[:-1]
    num_experts = moe.router_weight.shape[0]
    scores = jax.nn.sigmoid(
        x.astype(jnp.float32) @ moe.router_weight.T.astype(jnp.float32)
    )  # (..., E)
    choice = scores + moe.correction_bias.astype(jnp.float32)

    group_size = num_experts // moe.n_group
    grouped = choice.reshape(*lead, moe.n_group, group_size)
    top2 = jax.lax.top_k(grouped, min(2, group_size))[0]
    group_scores = jnp.sum(top2, axis=-1)  # (..., n_group)
    _, group_idx = jax.lax.top_k(group_scores, moe.topk_group)
    group_mask = jnp.sum(
        jax.nn.one_hot(group_idx, moe.n_group, dtype=jnp.float32),
        axis=-2,
    )  # (..., n_group)
    expert_mask = jnp.repeat(
        group_mask, group_size, axis=-1
    )  # (..., E)
    masked_choice = jnp.where(expert_mask > 0, choice, 0.0)

    _, top_ids = jax.lax.top_k(masked_choice, moe.top_k)
    # weights come from the raw scores (without correction bias)
    top_w = jnp.take_along_axis(scores, top_ids, axis=-1)
    if moe.norm_topk_prob:
        top_w = top_w / (
            jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20
        )
    top_w = top_w * moe.routed_scaling_factor

    if tp is not None:
        # inside the whole-model shard_map: stacked experts are
        # already local (expert-sharded at placement); shared experts
        # run Megatron-TP like a dense mlp
        from vptq_tpu.parallel.expert_parallel import moe_local

        if moe.stacked is None:
            raise NotImplementedError(
                "shard_map TP DeepseekMoe needs stacked experts"
            )
        routed = moe_local(
            moe.stacked, x, top_ids.astype(jnp.int32), top_w,
            num_experts, tp[0],
        ).astype(x.dtype)
        return routed + _mlp(moe.shared_experts, x, tp=tp)

    routed = _route_moe(
        x, top_ids, top_w, num_experts,
        moe.experts, moe.stacked, moe.ep_mesh, moe.ep_axis,
    )
    return routed + _mlp(moe.shared_experts, x)


# decode fast path engages when the (static) token count is at most
# this — each token reads k experts' bytes, so batches where
# n_tokens * k approaches E are better served by the dense
# all-experts path (which reads each expert once).
_MOE_FAST_MAX_TOKENS = 64

# token-tile bound for the per-expert matmul: the expert kernels hold
# a full token tile of x + f32 accumulator + out in VMEM, so larger
# prefills are chunked here (ADVICE r1: guard inside the wrapper).
_EXPERT_MATMUL_MAX_TOKENS = 512


def _expert_matmul(x2, wq, scales, e, fmt="int8"):
    """(T, in) @ expert e of stacked (E, out, in[/2]) quantized
    weights (int8 or packed-nibble int4). Chunks the token dim at
    ``_EXPERT_MATMUL_MAX_TOKENS`` to bound kernel VMEM."""
    from vptq_tpu.ops.quant_matmul import use_pallas

    in_p = wq.shape[2] * (2 if fmt == "int4" else 1)
    if x2.shape[-1] != in_p:
        x2 = jnp.pad(x2, ((0, 0), (0, in_p - x2.shape[-1])))
    if x2.shape[0] > _EXPERT_MATMUL_MAX_TOKENS:
        step = _EXPERT_MATMUL_MAX_TOKENS
        return jnp.concatenate(
            [
                _expert_matmul(x2[i: i + step], wq, scales, e, fmt)
                for i in range(0, x2.shape[0], step)
            ],
            axis=0,
        )
    out_f = wq.shape[1]
    ot = 1024 if out_f >= 1024 else (512 if out_f >= 512 else 256)
    if use_pallas():
        if fmt == "int4":
            from vptq_tpu.ops.pallas_gemm import w4_matmul_expert

            return w4_matmul_expert(
                x2, wq, scales, e, out_tile=ot, in_tile=2048
            )
        from vptq_tpu.ops.pallas_gemm import w8_matmul_expert

        group = in_p // scales.shape[1]
        in_tile = group
        for cand in (2048, 1024, 512):
            if cand <= group and group % cand == 0:
                in_tile = cand
                break
        return w8_matmul_expert(
            x2, wq, scales, e, out_tile=ot, in_tile=in_tile
        )
    wq_e = jax.lax.dynamic_index_in_dim(wq, e, 0, keepdims=False)
    s_e = jax.lax.dynamic_index_in_dim(scales, e, 0, keepdims=False)
    if fmt == "int4":
        lo = jnp.right_shift(jnp.left_shift(wq_e, 4), 4)
        hi = jnp.right_shift(wq_e, 4)
        q = jnp.concatenate([lo, hi], axis=1)
        w = (
            q.astype(jnp.float32).reshape(out_f, -1, 128)
            * s_e.astype(jnp.float32).T[:, :, None]
        ).reshape(out_f, in_p)
    else:
        group = in_p // s_e.shape[0]
        w = (
            wq_e.astype(jnp.float32).reshape(out_f, -1, group)
            * s_e.T[:, :, None]
        ).reshape(wq_e.shape)
    return jnp.dot(
        x2.astype(jnp.float32), w.T,
        preferred_element_type=jnp.float32,
    ).astype(x2.dtype)


def _pairs_matmul(x_pairs, wq, scales, experts, fmt="int8"):
    """(P, in) activation rows through their per-pair experts of a
    stacked (E, out, in[/2]) weight — ONE kernel dispatch for all
    (token, top-k) pairs of a MoE step (w8/w4_matmul_pairs)."""
    from vptq_tpu.ops.quant_matmul import use_pallas

    in_p = wq.shape[2] * (2 if fmt == "int4" else 1)
    if x_pairs.shape[-1] != in_p:
        x_pairs = jnp.pad(
            x_pairs, ((0, 0), (0, in_p - x_pairs.shape[-1]))
        )
    out_f = wq.shape[1]
    ot = 1024 if out_f >= 1024 else (512 if out_f >= 512 else 256)
    if use_pallas():
        if fmt == "int4":
            from vptq_tpu.ops.pallas_gemm import w4_matmul_pairs

            return w4_matmul_pairs(
                x_pairs, wq, scales, experts,
                out_tile=ot, in_tile=2048,
            )
        from vptq_tpu.ops.pallas_gemm import w8_matmul_pairs

        group = in_p // scales.shape[1]
        in_tile = group
        for cand in (2048, 1024, 512):
            if cand <= group and group % cand == 0:
                in_tile = cand
                break
        return w8_matmul_pairs(
            x_pairs, wq, scales, experts, out_tile=ot, in_tile=in_tile
        )
    # XLA fallback: gather per-pair expert weights, dequant, batch dot
    w_e = jnp.take(wq, experts, axis=0)  # (P, out, in[/2])
    s_e = jnp.take(scales, experts, axis=0)  # (P, G, out)
    n_pairs = w_e.shape[0]
    if fmt == "int4":
        lo = jnp.right_shift(jnp.left_shift(w_e, 4), 4)
        hi = jnp.right_shift(w_e, 4)
        q = jnp.concatenate([lo, hi], axis=2)
        w = (
            q.astype(jnp.float32).reshape(n_pairs, out_f, -1, 128)
            * s_e.astype(jnp.float32).transpose(0, 2, 1)[:, :, :, None]
        ).reshape(n_pairs, out_f, in_p)
    else:
        group = in_p // s_e.shape[1]
        w = (
            w_e.astype(jnp.float32).reshape(n_pairs, out_f, -1, group)
            * s_e.transpose(0, 2, 1)[:, :, :, None]
        ).reshape(n_pairs, out_f, in_p)
    out = jnp.einsum(
        "pi,poi->po", x_pairs.astype(jnp.float32), w
    )
    return out.astype(x_pairs.dtype)


def _moe_fast(
    stacked: StackedExperts,
    x: jnp.ndarray,  # (..., hidden)
    top_ids: jnp.ndarray,  # (..., k) int32
    top_w: jnp.ndarray,  # (..., k) f32
) -> jnp.ndarray:
    """Selected-experts evaluation, batched over (token, k) pairs.

    All n*k pairs flow through TWO kernel dispatches (gate_up + down),
    each pair DMAing only its expert's bytes — trace size and dispatch
    count are O(1) in batch (the round-1 version looped Python-per-pair
    and was capped at 8 tokens)."""
    lead = x.shape[:-1]
    hidden = x.shape[-1]
    n = 1
    for d in lead:
        n *= d
    k = top_ids.shape[-1]
    xf = x.reshape(n, hidden)
    ids = top_ids.reshape(n * k).astype(jnp.int32)
    ws = top_w.reshape(n, k)
    x_pairs = jnp.repeat(xf, k, axis=0)  # (n*k, hidden)
    inter2 = stacked.gate_up_wq.shape[1]

    gu = _pairs_matmul(
        x_pairs, stacked.gate_up_wq, stacked.gate_up_scales, ids,
        stacked.fmt,
    )
    gate, up = jnp.split(gu[:, :inter2], 2, axis=-1)
    h = jax.nn.silu(gate) * up
    down = _pairs_matmul(
        h, stacked.down_wq, stacked.down_scales, ids, stacked.fmt
    )  # (n*k, hidden)
    out = jnp.sum(
        down.reshape(n, k, hidden).astype(jnp.float32)
        * ws[..., None].astype(jnp.float32),
        axis=1,
    )
    return out.reshape(*lead, hidden).astype(x.dtype)


def _stacked_expert_mlp(stacked, x2, e):
    """One expert's SwiGLU MLP on (T, hidden) rows from the stacked
    weights (the all-experts dense path — expert weights exist once)."""
    inter2 = stacked.gate_up_wq.shape[1]
    gu = _expert_matmul(
        x2, stacked.gate_up_wq, stacked.gate_up_scales, e, stacked.fmt
    )
    gate, up = jnp.split(gu[:, :inter2], 2, axis=-1)
    h = jax.nn.silu(gate) * up
    return _expert_matmul(
        h, stacked.down_wq, stacked.down_scales, e, stacked.fmt
    )


def _moe_dense_mix(moe_experts, stacked, x, mix):
    """Dense all-experts evaluation mixed by (..., E) routing weights.

    Uses the per-expert modules when present, else the stacked arrays
    (``fuse_model`` drops per-expert copies to halve MoE HBM)."""
    if moe_experts:
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for e, expert in enumerate(moe_experts):
            out = out + mix[..., e: e + 1] * _mlp(expert, x).astype(
                jnp.float32
            )
        return out
    lead = x.shape[:-1]
    hidden = x.shape[-1]
    x2 = x.reshape(-1, hidden)
    mix2 = mix.reshape(-1, mix.shape[-1]).astype(jnp.float32)
    n_experts = stacked.gate_up_wq.shape[0]
    out = jnp.zeros((x2.shape[0], hidden), jnp.float32)
    for e in range(n_experts):
        d = _stacked_expert_mlp(
            stacked, x2, jnp.asarray(e, jnp.int32)
        )[:, :hidden]
        out = out + mix2[:, e: e + 1] * d.astype(jnp.float32)
    return out.reshape(*lead, hidden)


def _route_moe(
    x: jnp.ndarray,  # (..., hidden)
    top_ids: jnp.ndarray,  # (..., k) int32
    top_w: jnp.ndarray,  # (..., k) f32
    num_experts: int,
    experts: Tuple[Mlp, ...],
    stacked: Optional[StackedExperts],
    ep_mesh,
    ep_axis: str,
) -> jnp.ndarray:
    """Dispatch routed tokens to experts (shared by Mixtral/DeepSeek).

    Expert-parallel when ``ep_mesh`` is set (each device holds E/D
    experts, psum combine); else selected-experts fast path for small
    token counts, dense all-experts otherwise."""
    if ep_mesh is not None and stacked is not None:
        from vptq_tpu.parallel.expert_parallel import moe_forward_ep

        return moe_forward_ep(
            stacked, x, top_ids, top_w, num_experts, ep_mesh, ep_axis
        ).astype(x.dtype)
    n_tokens = 1
    for d in x.shape[:-1]:
        n_tokens *= d
    if stacked is not None and n_tokens <= _MOE_FAST_MAX_TOKENS:
        return _moe_fast(stacked, x, top_ids, top_w)
    # scatter normalized weights back to a dense (..., E) mix tensor
    mix = jnp.sum(
        jax.nn.one_hot(top_ids, num_experts, dtype=jnp.float32)
        * top_w[..., None].astype(jnp.float32),
        axis=-2,
    )
    return _moe_dense_mix(experts, stacked, x, mix).astype(x.dtype)


def _moe_mlp(moe: MoeMlp, x: jnp.ndarray) -> jnp.ndarray:
    # router in fp32 (HF MixtralSparseMoeBlock does the same)
    logits = moe.router(x).astype(jnp.float32)  # (..., E)
    k = moe.num_experts_per_tok
    top_w, top_ids = jax.lax.top_k(logits, k)
    top_w = jax.nn.softmax(top_w, axis=-1)  # normalize over top-k
    num_experts = (
        len(moe.experts)
        if moe.experts
        else moe.stacked.gate_up_wq.shape[0]
    )
    return _route_moe(
        x, top_ids, top_w, num_experts,
        moe.experts, moe.stacked, moe.ep_mesh, moe.ep_axis,
    )


def _moe_mlp_tp(
    moe: MoeMlp, x: jnp.ndarray, tp: Tuple[str, int]
) -> jnp.ndarray:
    """MoE block inside the whole-model shard_map TP forward: the
    stacked expert arrays are already LOCAL (expert-sharded at
    placement, parallel/tp.py); route replicated, evaluate local
    experts, psum (parallel.expert_parallel.moe_local)."""
    from vptq_tpu.parallel.expert_parallel import moe_local

    if moe.stacked is None:
        raise NotImplementedError(
            "shard_map TP MoE needs stacked experts (fuse_model)"
        )
    logits = moe.router(x).astype(jnp.float32)  # (..., E) global
    k = moe.num_experts_per_tok
    top_w, top_ids = jax.lax.top_k(logits, k)
    top_w = jax.nn.softmax(top_w, axis=-1)
    return moe_local(
        moe.stacked, x, top_ids.astype(jnp.int32), top_w,
        logits.shape[-1], tp[0],
    ).astype(x.dtype)


def _mlp(
    mlp, x: jnp.ndarray, tp: Optional[Tuple[str, int]] = None
) -> jnp.ndarray:
    if isinstance(mlp, MoeMlp):
        if tp is not None:
            return _moe_mlp_tp(mlp, x, tp)
        return _moe_mlp(mlp, x)
    if isinstance(mlp, DeepseekMoe):
        return _deepseek_moe(mlp, x, tp=tp)
    if mlp.gate_up_proj is not None:
        # under TP the fused gate|up rows are permuted at placement
        # time so each shard holds [gate_d | up_d] — the local split
        # below is then correct (parallel/tp.py _fused_gate_up_perm)
        gu = mlp.gate_up_proj(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return _row_parallel_out(
            mlp.down_proj, jax.nn.silu(gate) * up, x.dtype, tp
        )
    return _row_parallel_out(
        mlp.down_proj,
        jax.nn.silu(mlp.gate_proj(x)) * mlp.up_proj(x),
        x.dtype,
        tp,
    )


def forward(
    model: Model,
    tokens: jnp.ndarray,  # (B, S) int32
    cache: KVCache,
    dtype=jnp.bfloat16,
    fresh_prefill: bool = False,
    tp: Optional[Tuple[str, int]] = None,
    cp: Optional[Tuple[str, int]] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder over ``tokens`` starting at ``cache.lengths``.

    Returns (logits (B, S, vocab) fp32, updated cache).

    ``tp=(axis_name, size)``: the function body is running INSIDE a
    ``shard_map`` over a mesh axis (parallel/tp.py forward_tp) with
    Megatron tensor-parallel placement — this device computes its
    local heads / expert / vocab shard and the row-parallel outputs
    are psum'd over ICI. Never set directly; use
    ``parallel.tp.forward_tp``.

    ``cp=(axis_name, size)``: context parallelism for a FRESH prefill
    — ``tokens`` is this device's contiguous sequence chunk; every
    per-token op is chunk-local and attention runs as a K/V ring
    (parallel/ring.py). Use ``parallel.tp.prefill_cp``.
    """
    cfg = model.cfg
    batch, seq = tokens.shape
    if (
        tp is not None
        and model.embed_tokens.shape[0] < cfg.vocab_size
    ):
        # vocab-sharded embedding (untied models): local-range
        # lookup + psum — one bf16 activations-sized all-reduce
        # instead of a replicated (vocab, hidden) table per chip
        v_local = model.embed_tokens.shape[0]
        lo = (jax.lax.axis_index(tp[0]) * v_local).astype(jnp.int32)
        idx = tokens - lo
        ok = (idx >= 0) & (idx < v_local)
        safe = jnp.clip(idx, 0, v_local - 1)
        x = jnp.where(
            ok[..., None],
            model.embed_tokens[safe].astype(dtype),
            jnp.zeros((), dtype),
        )
        x = jax.lax.psum(x, tp[0])
    else:
        x = model.embed_tokens[tokens].astype(dtype)
    positions = (
        cache.lengths[:, None]
        + jnp.arange(seq)[None, :].astype(jnp.int32)
    )
    if cp is not None:
        if not fresh_prefill:
            raise ValueError("context parallelism needs fresh_prefill")
        # this device's chunk starts at global position chunk_idx*seq
        positions = positions + (
            jax.lax.axis_index(cp[0]) * seq
        ).astype(jnp.int32)
    inv_freq, rope_scale = rope_frequencies(cfg)
    cos, sin = rope_cos_sin(positions, inv_freq, rope_scale)

    for i, block in enumerate(model.blocks):
        h = rms_norm(x, block.input_layernorm, cfg.rms_norm_eps)
        if isinstance(block.attn, MlaAttention):
            if cp is not None:
                raise NotImplementedError(
                    "MLA under context parallelism"
                )
            attn_out, cache = _mla_attention(
                i, block.attn, h, cos, sin, cache, cfg, tp=tp,
            )
        else:
            attn_out, cache = _attention(
                i, block.attn, h, cos, sin, cache, cfg,
                fresh_prefill=fresh_prefill, tp=tp, cp=cp,
            )
        x = x + attn_out
        h = rms_norm(x, block.post_attention_layernorm, cfg.rms_norm_eps)
        x = x + _mlp(block.mlp, h, tp=tp)

    x = rms_norm(x, model.norm, cfg.rms_norm_eps)
    if model.lm_head is not None:
        logits = model.lm_head(x)
        if tp is not None:
            # lm_head is column-parallel: gather the vocab shards
            # (one (B, S, V/n) f32 all-gather per step — tiny next to
            # the weight traffic it avoids)
            logits = jax.lax.all_gather(
                logits, tp[0], axis=logits.ndim - 1, tiled=True
            )
    else:
        logits = jnp.dot(
            x,
            model.embed_tokens.T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    cache = KVCache(
        k=cache.k,
        v=cache.v,
        lengths=cache.lengths + seq * (cp[1] if cp is not None else 1),
    )
    return logits.astype(jnp.float32), cache
