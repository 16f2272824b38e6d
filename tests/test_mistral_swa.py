"""Mistral sliding-window attention parity vs HF."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.models.loader import load_model
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def test_sliding_window_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    from test_model_e2e import _dequant_layer_np

    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(model_type="mistral"),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=91,
    )
    conf_path = tmp_path / "config.json"
    conf = json.loads(conf_path.read_text())
    conf["sliding_window"] = 8  # well below the 24-token sequence
    conf_path.write_text(json.dumps(conf))

    model = load_model(str(tmp_path), dtype=jnp.float32)
    mc = model.cfg
    assert mc.sliding_window == 8

    hf_cfg = MistralConfig(
        vocab_size=mc.vocab_size,
        hidden_size=mc.hidden_size,
        intermediate_size=mc.intermediate_size,
        num_hidden_layers=mc.num_hidden_layers,
        num_attention_heads=mc.num_attention_heads,
        num_key_value_heads=mc.num_key_value_heads,
        head_dim=mc.head_dim,
        rms_norm_eps=mc.rms_norm_eps,
        rope_theta=mc.rope_theta,
        sliding_window=8,
        tie_word_embeddings=True,
    )
    hf = MistralForCausalLM(hf_cfg).eval().to(torch.float32)

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
        for mod, name in [
            (block.attn.q_proj, "self_attn.q_proj"),
            (block.attn.k_proj, "self_attn.k_proj"),
            (block.attn.v_proj, "self_attn.v_proj"),
            (block.attn.o_proj, "self_attn.o_proj"),
            (block.mlp.gate_proj, "mlp.gate_proj"),
            (block.mlp.up_proj, "mlp.up_proj"),
            (block.mlp.down_proj, "mlp.down_proj"),
        ]:
            sd[f"{p}.{name}.weight"] = torch.from_numpy(
                _dequant_layer_np(mod)
            )
    sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    hf.load_state_dict(sd, strict=False)

    rng = np.random.default_rng(14)
    tokens = rng.integers(0, mc.vocab_size, size=(1, 24),
                          dtype=np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()

    cache = init_cache(mc, 1, 32, dtype=jnp.float32)
    logits, _ = forward(
        model, jnp.asarray(tokens, jnp.int32), cache, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=2e-3, atol=2e-3
    )
