"""Phi-3 family e2e: fused qkv/gate_up checkpoint tensors vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.models.loader import load_model
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def test_phi3_logits_match_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    from test_model_e2e import _dequant_layer_np

    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(
            model_type="phi3",
            num_key_value_heads=4,  # phi3 uses MHA-style q_out==h
            num_attention_heads=4,
            head_dim=16,
            tie_word_embeddings=True,
        ),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=71,
    )

    model = load_model(str(tmp_path), dtype=jnp.float32)
    mc = model.cfg
    assert model.blocks[0].attn.qkv_proj is not None
    assert model.blocks[0].mlp.gate_up_proj is not None

    hf_cfg = Phi3Config(
        vocab_size=mc.vocab_size,
        hidden_size=mc.hidden_size,
        intermediate_size=mc.intermediate_size,
        num_hidden_layers=mc.num_hidden_layers,
        num_attention_heads=mc.num_attention_heads,
        num_key_value_heads=mc.num_key_value_heads,
        rms_norm_eps=mc.rms_norm_eps,
        rope_theta=mc.rope_theta,
        tie_word_embeddings=True,
        sliding_window=None,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    hf = Phi3ForCausalLM(hf_cfg).eval().to(torch.float32)

    sd = {
        "model.embed_tokens.weight": torch.from_numpy(
            np.asarray(model.embed_tokens, dtype=np.float32)
        ),
        "model.norm.weight": torch.from_numpy(
            np.asarray(model.norm, dtype=np.float32)
        ),
    }
    for i, block in enumerate(model.blocks):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = torch.from_numpy(
            np.asarray(block.input_layernorm, dtype=np.float32)
        )
        sd[f"{p}.post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(block.post_attention_layernorm, dtype=np.float32)
        )
        sd[f"{p}.self_attn.qkv_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(block.attn.qkv_proj)
        )
        sd[f"{p}.self_attn.o_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(block.attn.o_proj)
        )
        sd[f"{p}.mlp.gate_up_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(block.mlp.gate_up_proj)
        )
        sd[f"{p}.mlp.down_proj.weight"] = torch.from_numpy(
            _dequant_layer_np(block.mlp.down_proj)
        )
    sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected

    rng = np.random.default_rng(12)
    tokens = rng.integers(0, mc.vocab_size, size=(1, 6), dtype=np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()

    cache = init_cache(mc, 1, 8, dtype=jnp.float32)
    logits, _ = forward(
        model, jnp.asarray(tokens, jnp.int32), cache, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=2e-3, atol=2e-3
    )
