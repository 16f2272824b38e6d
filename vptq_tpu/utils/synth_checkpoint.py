"""Write synthetic VPTQ checkpoints in the exact community on-disk
format.

With no network egress the real VPTQ-community checkpoints cannot be
downloaded, so tests and benchmarks build random checkpoints that are
byte-layout-faithful to the reference format (packed int32 index
streams, uint16-viewed-as-int16 perms, ``quantization_config`` in
config.json as written by reference vptq/utils/pack.py:147-242) and
push them through the full ingestion path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vptq_tpu.config import VQLinearConfig
from vptq_tpu.models.llama import ModelConfig
from vptq_tpu.ops.packing import pack_index
from vptq_tpu.utils.synth import make_config, make_numpy_planes

__all__ = ["write_synthetic_checkpoint", "tiny_model_config"]


def tiny_model_config(**overrides) -> ModelConfig:
    defaults = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        model_type="llama",
    )
    defaults.update(overrides)
    return ModelConfig(**defaults)


def _layer_tensors(
    prefix: str,
    cfg: VQLinearConfig,
    seed: int,
    dtype=np.float16,
    heavy_tailed: bool = False,
) -> Dict[str, np.ndarray]:
    """Tensors of one quantized linear, checkpoint-format."""
    planes = make_numpy_planes(
        cfg, seed=seed, dtype=dtype, heavy_tailed=heavy_tailed
    )
    c, k, v = cfg.num_codebooks, cfg.num_main_centroids, cfg.vector_len

    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}.centroids.weight"] = planes["centroids"].reshape(c, k * v)
    if cfg.is_indice_packed:
        res64 = (
            planes["res_ids"].astype(np.int64)
            if planes["res_ids"] is not None
            else None
        )
        out[f"{prefix}.indices"] = pack_index(
            planes["ids"].astype(np.int64),
            cfg.index_bits,
            res64,
            cfg.res_index_bits,
        )
    else:
        # uint16 viewed as int16/f16 (reference vqlinear.py:110-113)
        view = np.float16 if cfg.indices_as_float else np.int16
        out[f"{prefix}.indices"] = (
            planes["ids"].astype(np.uint16).view(view)
        )
        if planes["res_ids"] is not None:
            out[f"{prefix}.res_indices"] = (
                planes["res_ids"].astype(np.uint16).view(view)
            )
    if planes["res_centroids"] is not None:
        kr = cfg.num_main_res_centroids
        out[f"{prefix}.res_centroids.weight"] = planes[
            "res_centroids"
        ].reshape(c, kr * v)
    if planes["outlier_centroids"] is not None:
        ko, vo = cfg.num_outlier_centroids, cfg.outlier_vector_len
        out[f"{prefix}.outlier_centroids.weight"] = planes[
            "outlier_centroids"
        ].reshape(1, ko * vo)
        view = np.float16 if cfg.indices_as_float else np.int16
        out[f"{prefix}.outlier_indices"] = (
            planes["outlier_ids"].astype(np.uint16).view(view)
        )
    if planes["perm"] is not None:
        out[f"{prefix}.perm"] = planes["perm"].view(np.int16)
    if planes["weight_scale"] is not None:
        out[f"{prefix}.weight_scale"] = planes["weight_scale"].astype(dtype)
        out[f"{prefix}.weight_bias"] = planes["weight_bias"].astype(dtype)
    if planes["bias"] is not None:
        out[f"{prefix}.bias"] = planes["bias"].astype(dtype)
    return out


def write_synthetic_checkpoint(
    path: str,
    model_cfg: Optional[ModelConfig] = None,
    vq_kwargs: Optional[dict] = None,
    seed: int = 0,
    dtype=np.float16,
    qkv_bias: bool = False,
    vq_lm_head: bool = False,
    heavy_tailed: bool = False,
) -> Path:
    """Create ``path`` with config.json + model.safetensors.

    ``vq_kwargs`` override :func:`make_config` geometry knobs (per-shape
    fields in/out_features are filled in per projection).

    ``vq_lm_head``: emit the lm_head as a VPTQ-quantized layer (some
    community checkpoints quantize the vocab projection too) instead of
    a dense ``lm_head.weight``. Requires untied embeddings.
    """
    from safetensors.numpy import save_file

    mc = model_cfg or tiny_model_config()
    vq_kwargs = dict(vq_kwargs or {})
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    h = mc.hidden_size
    q_out = mc.num_attention_heads * mc.head_dim
    kv_out = mc.num_key_value_heads * mc.head_dim
    inter = mc.intermediate_size

    if mc.is_mla:
        # DeepSeek-V3: MLA attention + fine-grained MoE
        nh = mc.num_attention_heads
        qk_hd = mc.qk_nope_head_dim + mc.qk_rope_head_dim
        proj_shapes = {
            "self_attn.kv_a_proj_with_mqa": (
                h, mc.kv_lora_rank + mc.qk_rope_head_dim
            ),
            "self_attn.kv_b_proj": (
                mc.kv_lora_rank,
                nh * (mc.qk_nope_head_dim + mc.v_head_dim),
            ),
            "self_attn.o_proj": (nh * mc.v_head_dim, h),
        }
        if mc.q_lora_rank:
            proj_shapes["self_attn.q_a_proj"] = (h, mc.q_lora_rank)
            proj_shapes["self_attn.q_b_proj"] = (
                mc.q_lora_rank, nh * qk_hd
            )
        else:
            proj_shapes["self_attn.q_proj"] = (h, nh * qk_hd)
    elif mc.num_local_experts > 0:
        # mixtral layout: router + per-expert w1/w2/w3
        proj_shapes = {
            "self_attn.q_proj": (h, q_out),
            "self_attn.k_proj": (h, kv_out),
            "self_attn.v_proj": (h, kv_out),
            "self_attn.o_proj": (q_out, h),
        }
        for e in range(mc.num_local_experts):
            proj_shapes[f"block_sparse_moe.experts.{e}.w1"] = (h, inter)
            proj_shapes[f"block_sparse_moe.experts.{e}.w3"] = (h, inter)
            proj_shapes[f"block_sparse_moe.experts.{e}.w2"] = (inter, h)
    elif mc.model_type in ("phi3", "phi3_v", "phimoe"):
        # phi3 checkpoints ship fused projections
        proj_shapes = {
            "self_attn.qkv_proj": (h, q_out + 2 * kv_out),
            "self_attn.o_proj": (q_out, h),
            "mlp.gate_up_proj": (h, 2 * inter),
            "mlp.down_proj": (inter, h),
        }
    else:
        proj_shapes = {
            "self_attn.q_proj": (h, q_out),
            "self_attn.k_proj": (h, kv_out),
            "self_attn.v_proj": (h, kv_out),
            "self_attn.o_proj": (q_out, h),
            "mlp.gate_proj": (h, inter),
            "mlp.up_proj": (h, inter),
            "mlp.down_proj": (inter, h),
        }

    tensors: Dict[str, np.ndarray] = {}
    config_for_layers: Dict[str, dict] = {}
    for i in range(mc.num_hidden_layers):
        layer_shapes = dict(proj_shapes)
        if mc.is_mla:
            if i < mc.first_k_dense_replace or mc.n_routed_experts == 0:
                layer_shapes["mlp.gate_proj"] = (h, inter)
                layer_shapes["mlp.up_proj"] = (h, inter)
                layer_shapes["mlp.down_proj"] = (inter, h)
            else:
                mi = mc.moe_intermediate_size
                for e in range(mc.n_routed_experts):
                    layer_shapes[f"mlp.experts.{e}.gate_proj"] = (h, mi)
                    layer_shapes[f"mlp.experts.{e}.up_proj"] = (h, mi)
                    layer_shapes[f"mlp.experts.{e}.down_proj"] = (mi, h)
                smi = mi * mc.n_shared_experts
                layer_shapes["mlp.shared_experts.gate_proj"] = (h, smi)
                layer_shapes["mlp.shared_experts.up_proj"] = (h, smi)
                layer_shapes["mlp.shared_experts.down_proj"] = (smi, h)
                tensors[f"model.layers.{i}.mlp.gate.weight"] = (
                    0.05 * rng.standard_normal(
                        (mc.n_routed_experts, h)
                    )
                ).astype(np.float32)
                tensors[
                    f"model.layers.{i}.mlp.gate.e_score_correction_bias"
                ] = (
                    0.1 * rng.standard_normal(mc.n_routed_experts)
                ).astype(np.float32)
            tensors[
                f"model.layers.{i}.self_attn.kv_a_layernorm.weight"
            ] = np.ones(mc.kv_lora_rank, dtype=dtype)
            if mc.q_lora_rank:
                tensors[
                    f"model.layers.{i}.self_attn.q_a_layernorm.weight"
                ] = np.ones(mc.q_lora_rank, dtype=dtype)
        for name, (in_f, out_f) in layer_shapes.items():
            prefix = f"model.layers.{i}.{name}"
            has_bias = qkv_bias and name in (
                "self_attn.q_proj", "self_attn.k_proj",
                "self_attn.v_proj",
            )
            cfg = make_config(
                in_features=in_f, out_features=out_f,
                bias=has_bias, **vq_kwargs
            )
            tensors.update(
                _layer_tensors(
                    prefix, cfg, seed=int(rng.integers(1 << 31)),
                    dtype=dtype, heavy_tailed=heavy_tailed,
                )
            )
            config_for_layers[prefix] = cfg.to_dict()
        if mc.num_local_experts > 0:
            tensors[
                f"model.layers.{i}.block_sparse_moe.gate.weight"
            ] = (
                0.02
                * rng.standard_normal((mc.num_local_experts, h))
            ).astype(dtype)
        tensors[f"model.layers.{i}.input_layernorm.weight"] = (
            np.ones(h, dtype=dtype)
            + 0.01 * rng.standard_normal(h).astype(dtype)
        )
        tensors[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.ones(h, dtype=dtype)
            + 0.01 * rng.standard_normal(h).astype(dtype)
        )

    tensors["model.embed_tokens.weight"] = (
        0.02 * rng.standard_normal((mc.vocab_size, h))
    ).astype(dtype)
    tensors["model.norm.weight"] = np.ones(h, dtype=dtype)
    if not mc.tie_word_embeddings:
        if vq_lm_head:
            cfg = make_config(
                in_features=h, out_features=mc.vocab_size, **vq_kwargs
            )
            tensors.update(
                _layer_tensors(
                    "lm_head", cfg,
                    seed=int(rng.integers(1 << 31)), dtype=dtype,
                )
            )
            config_for_layers["lm_head"] = cfg.to_dict()
        else:
            tensors["lm_head.weight"] = (
                0.02 * rng.standard_normal((mc.vocab_size, h))
            ).astype(dtype)
    elif vq_lm_head:
        raise ValueError("vq_lm_head requires tie_word_embeddings=False")

    save_file(tensors, root / "model.safetensors")

    arch = {
        "llama": "LlamaForCausalLM",
        "qwen2": "Qwen2ForCausalLM",
        "mixtral": "MixtralForCausalLM",
        "deepseek_v3": "DeepseekV3ForCausalLM",
        "phi3": "Phi3ForCausalLM",
        "mistral": "MistralForCausalLM",
    }.get(mc.model_type, "LlamaForCausalLM")
    hf_config = {
        "architectures": [arch],
        "model_type": mc.model_type,
        "vocab_size": mc.vocab_size,
        "hidden_size": mc.hidden_size,
        "intermediate_size": mc.intermediate_size,
        "num_hidden_layers": mc.num_hidden_layers,
        "num_attention_heads": mc.num_attention_heads,
        "num_key_value_heads": mc.num_key_value_heads,
        "head_dim": mc.head_dim,
        "rms_norm_eps": mc.rms_norm_eps,
        "rope_theta": mc.rope_theta,
        "attention_bias": qkv_bias,
        "max_position_embeddings": mc.max_position_embeddings,
        "q_lora_rank": mc.q_lora_rank,
        "kv_lora_rank": mc.kv_lora_rank or None,
        "qk_nope_head_dim": mc.qk_nope_head_dim,
        "qk_rope_head_dim": mc.qk_rope_head_dim,
        "v_head_dim": mc.v_head_dim,
        "rope_interleave": mc.rope_interleave,
        "moe_intermediate_size": mc.moe_intermediate_size,
        "n_routed_experts": mc.n_routed_experts or None,
        "n_shared_experts": mc.n_shared_experts or None,
        "n_group": mc.n_group,
        "topk_group": mc.topk_group,
        "norm_topk_prob": mc.norm_topk_prob,
        "routed_scaling_factor": mc.routed_scaling_factor,
        "first_k_dense_replace": mc.first_k_dense_replace,
        "num_local_experts": mc.num_local_experts,
        "num_experts_per_tok": mc.num_experts_per_tok,
        "tie_word_embeddings": mc.tie_word_embeddings,
        "torch_dtype": "float16" if dtype == np.float16 else "bfloat16",
        "quantization_config": {
            "quant_method": "vptq",
            "config_for_layers": config_for_layers,
        },
    }
    with open(root / "config.json", "w") as f:
        json.dump(hf_config, f, indent=2)
    return root
