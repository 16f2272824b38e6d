"""End-to-end: synthetic checkpoint → loader → decoder vs HF Llama.

Builds a random VPTQ checkpoint in the community on-disk format, loads
it through the full ingestion path, and checks model logits against HF
transformers' ``LlamaForCausalLM`` running the *dequantized* weights —
validating RoPE/GQA/SwiGLU/norm semantics and the loader in one shot.
(The reference's own e2e test just prints generations,
tests/test_generation.py:30-46 — this is stricter.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.models.loader import load_model
from vptq_tpu.ops.dequant import dequant_weight
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)

VQ_KWARGS = dict(
    vector_len=4,
    num_centroids=64,
    num_res_centroids=16,
    enable_norm=True,
    is_indice_packed=True,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("synth_ckpt")
    write_synthetic_checkpoint(
        path, tiny_model_config(), vq_kwargs=VQ_KWARGS, seed=11
    )
    return path


def _dequant_layer_np(layer):
    return np.asarray(
        dequant_weight(
            centroids=layer.centroids.astype(jnp.float32),
            ids=layer.ids.astype(jnp.int32),
            res_centroids=None
            if layer.res_centroids is None
            else layer.res_centroids.astype(jnp.float32),
            res_ids=None
            if layer.res_ids is None
            else layer.res_ids.astype(jnp.int32),
            outlier_centroids=None
            if layer.outlier_centroids is None
            else layer.outlier_centroids.astype(jnp.float32),
            outlier_ids=None
            if layer.outlier_ids is None
            else layer.outlier_ids.astype(jnp.int32),
            inv_perm=layer.inv_perm,
            weight_scale=None
            if layer.weight_scale is None
            else layer.weight_scale.astype(jnp.float32),
            weight_bias=None
            if layer.weight_bias is None
            else layer.weight_bias.astype(jnp.float32),
            cfg=layer.cfg,
        )
    )


def test_logits_match_hf(ckpt):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    model = load_model(str(ckpt), dtype=jnp.float32)
    mc = model.cfg

    hf_cfg = LlamaConfig(
        vocab_size=mc.vocab_size,
        hidden_size=mc.hidden_size,
        intermediate_size=mc.intermediate_size,
        num_hidden_layers=mc.num_hidden_layers,
        num_attention_heads=mc.num_attention_heads,
        num_key_value_heads=mc.num_key_value_heads,
        head_dim=mc.head_dim,
        rms_norm_eps=mc.rms_norm_eps,
        rope_theta=mc.rope_theta,
        tie_word_embeddings=mc.tie_word_embeddings,
        attention_bias=False,
        mlp_bias=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)

    sd = {}
    sd["model.embed_tokens.weight"] = torch.from_numpy(
        np.asarray(model.embed_tokens, dtype=np.float32)
    )
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
    sd["model.norm.weight"] = torch.from_numpy(
        np.asarray(model.norm, dtype=np.float32)
    )
    if mc.tie_word_embeddings:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, mc.vocab_size, size=(1, 9), dtype=np.int64)

    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()

    cache = init_cache(mc, 1, 16, dtype=jnp.float32)
    logits, cache = forward(
        model, jnp.asarray(tokens, dtype=jnp.int32), cache,
        dtype=jnp.float32,
    )
    logits = np.asarray(logits)

    assert int(cache.lengths[0]) == 9
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)

    # incremental decode must match the full forward
    cache2 = init_cache(mc, 1, 16, dtype=jnp.float32)
    step_logits = None
    for t in range(tokens.shape[1]):
        step_logits, cache2 = forward(
            model,
            jnp.asarray(tokens[:, t: t + 1], dtype=jnp.int32),
            cache2,
            dtype=jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(step_logits)[:, 0], logits[:, -1], rtol=2e-3, atol=2e-3
    )


def test_generator_runs(ckpt):
    from vptq_tpu.serving.generate import Generator

    model = load_model(str(ckpt), dtype=jnp.float32)
    gen = Generator(model, max_seq=64, dtype=jnp.float32,
                    prompt_buckets=(16,))
    out = gen.generate([1, 2, 3, 4], max_new_tokens=5)
    assert len(out) == 5
    assert all(0 <= t < model.cfg.vocab_size for t in out)
    # greedy decoding is deterministic
    assert out == gen.generate([1, 2, 3, 4], max_new_tokens=5)


def test_long_prompt_chunked_prefill(ckpt):
    """Prompts longer than the largest bucket must prefill in chunks
    and match a generator with a big-enough single bucket."""
    from vptq_tpu.serving.generate import Generator

    model = load_model(str(ckpt), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = rng.integers(
        0, model.cfg.vocab_size, size=37, dtype=np.int64
    ).tolist()

    small = Generator(model, max_seq=64, dtype=jnp.float32,
                      prompt_buckets=(8, 16))
    big = Generator(model, max_seq=64, dtype=jnp.float32,
                    prompt_buckets=(64,))
    out_small = small.generate(prompt, max_new_tokens=6)
    out_big = big.generate(prompt, max_new_tokens=6)
    assert out_small == out_big


def test_decode_fast_path_matches_full_attention(ckpt):
    """The flash-decoding cache path (engaged at max_seq>=512) must
    match the dense-mask path exactly."""
    model = load_model(str(ckpt), dtype=jnp.float32)
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, model.cfg.vocab_size, size=12,
                          dtype=np.int64).tolist()

    from vptq_tpu.serving.generate import Generator

    # max_seq>=256 -> decode steps use _decode_attend_blocks
    fast = Generator(model, max_seq=256, dtype=jnp.float32,
                     prompt_buckets=(16,))
    fast512 = Generator(model, max_seq=512, dtype=jnp.float32,
                        prompt_buckets=(16,))
    # max_seq=64 -> dense-mask decode path
    dense = Generator(model, max_seq=64, dtype=jnp.float32,
                      prompt_buckets=(16,))
    out_fast = fast.generate(prompt, max_new_tokens=8)
    out_fast512 = fast512.generate(prompt, max_new_tokens=8)
    out_dense = dense.generate(prompt, max_new_tokens=8)
    assert out_fast == out_dense
    assert out_fast512 == out_dense
