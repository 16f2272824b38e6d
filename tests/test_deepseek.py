"""DeepSeek-V3 family e2e: MLA attention + grouped sigmoid MoE + yarn
rope vs HF DeepseekV3ForCausalLM."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.models.llama import (
    DeepseekMoe,
    MlaAttention,
    forward,
    init_cache,
)
from vptq_tpu.models.loader import load_model
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)

DS_CFG = dict(
    model_type="deepseek_v3",
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    head_dim=16,
    q_lora_rank=24,
    kv_lora_rank=16,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    rope_interleave=True,
    moe_intermediate_size=32,
    n_routed_experts=8,
    num_experts_per_tok=2,
    n_shared_experts=1,
    n_group=4,
    topk_group=2,
    norm_topk_prob=True,
    routed_scaling_factor=2.5,
    first_k_dense_replace=1,
    tie_word_embeddings=True,
)

VQ = dict(
    vector_len=4,
    num_centroids=64,
    num_res_centroids=16,
    enable_norm=True,
    is_indice_packed=True,
)


def _build_hf(model, rope_scaling=None):
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    from test_model_e2e import _dequant_layer_np

    mc = model.cfg
    hf_cfg = DeepseekV3Config(
        vocab_size=mc.vocab_size,
        hidden_size=mc.hidden_size,
        intermediate_size=mc.intermediate_size,
        num_hidden_layers=mc.num_hidden_layers,
        num_attention_heads=mc.num_attention_heads,
        num_key_value_heads=mc.num_key_value_heads,
        rms_norm_eps=mc.rms_norm_eps,
        rope_theta=mc.rope_theta,
        q_lora_rank=mc.q_lora_rank,
        kv_lora_rank=mc.kv_lora_rank,
        qk_nope_head_dim=mc.qk_nope_head_dim,
        qk_rope_head_dim=mc.qk_rope_head_dim,
        v_head_dim=mc.v_head_dim,
        head_dim=mc.qk_rope_head_dim,
        rope_interleave=mc.rope_interleave,
        moe_intermediate_size=mc.moe_intermediate_size,
        n_routed_experts=mc.n_routed_experts,
        num_experts_per_tok=mc.num_experts_per_tok,
        n_shared_experts=mc.n_shared_experts,
        n_group=mc.n_group,
        topk_group=mc.topk_group,
        norm_topk_prob=mc.norm_topk_prob,
        routed_scaling_factor=mc.routed_scaling_factor,
        first_k_dense_replace=mc.first_k_dense_replace,
        tie_word_embeddings=True,
        rope_scaling=rope_scaling,
        max_position_embeddings=mc.max_position_embeddings,
        pad_token_id=0,
        attention_bias=False,
    )
    hf = DeepseekV3ForCausalLM(hf_cfg).eval().to(torch.float32)

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    sd = {
        "model.embed_tokens.weight": t(model.embed_tokens),
        "model.norm.weight": t(model.norm),
    }
    for i, block in enumerate(model.blocks):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = t(block.input_layernorm)
        sd[f"{p}.post_attention_layernorm.weight"] = t(
            block.post_attention_layernorm
        )
        attn = block.attn
        sd[f"{p}.self_attn.q_a_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(attn.q_a_proj)
        )
        sd[f"{p}.self_attn.q_a_layernorm.weight"] = t(attn.q_a_norm)
        sd[f"{p}.self_attn.q_b_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(attn.q_b_proj)
        )
        sd[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = (
            torch.from_numpy(_dequant_layer_np(attn.kv_a_proj))
        )
        sd[f"{p}.self_attn.kv_a_layernorm.weight"] = t(attn.kv_a_norm)
        # kv_b was absorbed into uk/uv at load (latent attention);
        # rebuild the equivalent kv_b weight for HF from them so the
        # reference uses exactly the weights our model computes with
        uk = np.asarray(attn.uk, dtype=np.float32)  # (l, nh, dn)
        uv = np.asarray(attn.uv, dtype=np.float32)  # (l, nh, dv)
        kv_b_w = (
            np.concatenate([uk, uv], axis=2)  # (l, nh, dn+dv)
            .transpose(1, 2, 0)
            .reshape(-1, uk.shape[0])
        )
        sd[f"{p}.self_attn.kv_b_proj.weight"] = torch.from_numpy(
            np.ascontiguousarray(kv_b_w)
        )
        sd[f"{p}.self_attn.o_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(attn.o_proj)
        )
        mlp = block.mlp
        if isinstance(mlp, DeepseekMoe):
            sd[f"{p}.mlp.gate.weight"] = t(mlp.router_weight)
            sd[f"{p}.mlp.gate.e_score_correction_bias"] = t(
                mlp.correction_bias
            )
            for e, expert in enumerate(mlp.experts):
                ep = f"{p}.mlp.experts.{e}"
                sd[f"{ep}.gate_proj.weight"] = torch.from_numpy(
                    _dequant_layer_np(expert.gate_proj)
                )
                sd[f"{ep}.up_proj.weight"] = torch.from_numpy(
                    _dequant_layer_np(expert.up_proj)
                )
                sd[f"{ep}.down_proj.weight"] = torch.from_numpy(
                    _dequant_layer_np(expert.down_proj)
                )
            sp = f"{p}.mlp.shared_experts"
            sd[f"{sp}.gate_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.shared_experts.gate_proj)
            )
            sd[f"{sp}.up_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.shared_experts.up_proj)
            )
            sd[f"{sp}.down_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.shared_experts.down_proj)
            )
        else:
            sd[f"{p}.mlp.gate_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.gate_proj)
            )
            sd[f"{p}.mlp.up_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.up_proj)
            )
            sd[f"{p}.mlp.down_proj.weight"] = torch.from_numpy(
                _dequant_layer_np(mlp.down_proj)
            )
    sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected
    return hf


@pytest.mark.parametrize("yarn", [False, True], ids=["plain", "yarn"])
def test_deepseek_logits_match_hf(tmp_path, yarn):
    torch = pytest.importorskip("torch")

    write_synthetic_checkpoint(
        tmp_path, tiny_model_config(**DS_CFG), vq_kwargs=VQ, seed=101
    )
    rope_scaling = None
    if yarn:
        rope_scaling = {
            "rope_type": "yarn",
            "factor": 4.0,
            "beta_fast": 32,
            "beta_slow": 1,
            "mscale": 1.0,
            "mscale_all_dim": 1.0,
            "original_max_position_embeddings": 16,
        }
        conf_path = tmp_path / "config.json"
        conf = json.loads(conf_path.read_text())
        conf["rope_scaling"] = rope_scaling
        conf["max_position_embeddings"] = 64
        conf_path.write_text(json.dumps(conf))

    model = load_model(str(tmp_path), dtype=jnp.float32)
    assert isinstance(model.blocks[0].attn, MlaAttention)
    assert not isinstance(model.blocks[0].mlp, DeepseekMoe)  # dense 1st
    assert isinstance(model.blocks[1].mlp, DeepseekMoe)

    hf = _build_hf(model, rope_scaling)

    rng = np.random.default_rng(15)
    tokens = rng.integers(
        0, model.cfg.vocab_size, size=(1, 20), dtype=np.int64
    )
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()

    cache = init_cache(model.cfg, 1, 32, dtype=jnp.float32)
    logits, _ = forward(
        model, jnp.asarray(tokens, jnp.int32), cache, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=3e-3, atol=3e-3
    )

    # incremental decode parity
    cache2 = init_cache(model.cfg, 1, 32, dtype=jnp.float32)
    for ti in range(tokens.shape[1]):
        step_logits, cache2 = forward(
            model,
            jnp.asarray(tokens[:, ti: ti + 1], jnp.int32),
            cache2,
            dtype=jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(step_logits)[:, 0],
        hf_logits[:, -1],
        rtol=3e-3,
        atol=3e-3,
    )
