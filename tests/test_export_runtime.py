"""Runtime checkpoint export/import: forward-exact round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.tools.export_runtime import (
    export_runtime,
    load_runtime_model,
)
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)

VQ = dict(
    vector_len=4, num_centroids=64, num_res_centroids=16,
    enable_norm=True, is_indice_packed=True,
)


@pytest.mark.parametrize(
    "model_kwargs",
    [
        dict(),
        dict(model_type="mixtral", num_local_experts=4,
             num_experts_per_tok=2),
        dict(
            model_type="deepseek_v3",
            q_lora_rank=24, kv_lora_rank=16, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, rope_interleave=True,
            moe_intermediate_size=32, n_routed_experts=8,
            num_experts_per_tok=2, n_shared_experts=1, n_group=4,
            topk_group=2, first_k_dense_replace=1,
            routed_scaling_factor=2.5,
        ),
    ],
    ids=["llama", "mixtral", "deepseek"],
)
def test_export_round_trip(tmp_path, model_kwargs):
    src = tmp_path / "src"
    rt = tmp_path / "rt"
    write_synthetic_checkpoint(
        src, tiny_model_config(**model_kwargs), vq_kwargs=VQ, seed=111
    )
    model = load_model(str(src), dtype=jnp.float32,
                       runtime_format="int8")
    export_runtime(model, str(rt))
    model2 = load_runtime_model(str(rt))
    assert model2.cfg == model.cfg

    tokens = jnp.asarray([[3, 7, 11]], jnp.int32)
    c1 = init_cache(model.cfg, 1, 8, jnp.float32)
    l1, _ = forward(model, tokens, c1, dtype=jnp.float32)
    c2 = init_cache(model2.cfg, 1, 8, jnp.float32)
    l2, _ = forward(model2, tokens, c2, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6
    )


def test_full_size_layer_round_trip(tmp_path):
    """One decoder block at real 7B geometry (4096 hidden / 11008
    inter, fused qkv+gate_up int8) through export_runtime →
    load_runtime_model: arrays byte-identical, logits exact — the
    documented fast startup path (measured at full 7B: host
    load+re-encode 124s vs load_runtime_model 0.1s)."""
    import numpy as np

    from vptq_tpu.layers.runtime import _encode_int8
    from vptq_tpu.models.llama import (
        Attention,
        Block,
        Mlp,
        Model,
    )
    from vptq_tpu.utils.synth_checkpoint import tiny_model_config

    cfg = tiny_model_config(
        vocab_size=1024,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=1,
        num_attention_heads=32,
        num_key_value_heads=32,
        head_dim=128,
        tie_word_embeddings=True,
    )
    rng = np.random.default_rng(17)

    def enc(in_f, out_f):
        return _encode_int8(
            rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32),
            None,
        )

    h, inter = cfg.hidden_size, cfg.intermediate_size
    block = Block(
        input_layernorm=jnp.ones(h, jnp.float32),
        attn=Attention(
            q_proj=None, k_proj=None, v_proj=None,
            o_proj=enc(h, h),
            qkv_proj=enc(h, 3 * h),
        ),
        post_attention_layernorm=jnp.ones(h, jnp.float32),
        mlp=Mlp(
            gate_proj=None, up_proj=None,
            down_proj=enc(inter, h),
            gate_up_proj=enc(h, 2 * inter),
        ),
    )
    model = Model(
        embed_tokens=jnp.asarray(
            0.02 * rng.standard_normal((cfg.vocab_size, h)),
            jnp.bfloat16,
        ),
        blocks=(block,),
        norm=jnp.ones(h, jnp.float32),
        lm_head=None,
        cfg=cfg,
    )
    export_runtime(model, str(tmp_path / "rt"))
    model2 = load_runtime_model(str(tmp_path / "rt"))

    # byte-identical weights through the container
    b2 = model2.blocks[0]
    np.testing.assert_array_equal(
        np.asarray(block.attn.qkv_proj.wq),
        np.asarray(b2.attn.qkv_proj.wq),
    )
    np.testing.assert_array_equal(
        np.asarray(block.mlp.down_proj.scales),
        np.asarray(b2.mlp.down_proj.scales),
    )

    tokens = jnp.asarray([[3, 7, 11]], jnp.int32)
    l1, _ = forward(
        model, tokens, init_cache(cfg, 1, 8, jnp.bfloat16)
    )
    l2, _ = forward(
        model2, tokens, init_cache(cfg, 1, 8, jnp.bfloat16)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_export_round_trip_int3_mixed(tmp_path):
    """Int3MixedLinear (per-column mixed int3) survives the runtime
    checkpoint round trip forward-exactly."""
    src = tmp_path / "src"
    rt = tmp_path / "rt"
    write_synthetic_checkpoint(
        src, tiny_model_config(), vq_kwargs=VQ, seed=112
    )
    model = load_model(
        str(src), dtype=jnp.float32, runtime_format="int3-mixed",
        calibration=128,
    )
    from vptq_tpu.layers.runtime import Int3MixedLinear

    assert any(
        isinstance(b.attn.qkv_proj, Int3MixedLinear)
        for b in model.blocks
    )
    export_runtime(model, str(rt))
    model2 = load_runtime_model(str(rt))

    tokens = jnp.asarray([[3, 7, 11]], jnp.int32)
    c1 = init_cache(model.cfg, 1, 8, jnp.float32)
    l1, _ = forward(model, tokens, c1, dtype=jnp.float32)
    c2 = init_cache(model2.cfg, 1, 8, jnp.float32)
    l2, _ = forward(model2, tokens, c2, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6
    )


def test_export_round_trip_int2_and_int2_mixed(tmp_path):
    """Int2Linear and Int2MixedLinear survive the runtime checkpoint
    round trip forward-exactly (the 70B int2-mixed calibration probe
    died at export before this existed)."""
    src = tmp_path / "src"
    write_synthetic_checkpoint(
        src, tiny_model_config(), vq_kwargs=VQ, seed=112
    )
    for fmt, calib in (("int2", None), ("int2-mixed", 128)):
        rt = tmp_path / f"rt_{fmt}"
        kwargs = {} if calib is None else {"calibration": calib}
        model = load_model(
            str(src), dtype=jnp.float32, runtime_format=fmt, **kwargs
        )
        if fmt == "int2-mixed":
            from vptq_tpu.layers.runtime import Int2MixedLinear

            assert any(
                isinstance(b.attn.qkv_proj, Int2MixedLinear)
                for b in model.blocks
            )
        export_runtime(model, str(rt))
        model2 = load_runtime_model(str(rt))

        tokens = jnp.asarray([[3, 7, 11]], jnp.int32)
        c1 = init_cache(model.cfg, 1, 8, jnp.float32)
        l1, _ = forward(model, tokens, c1, dtype=jnp.float32)
        c2 = init_cache(model2.cfg, 1, 8, jnp.float32)
        l2, _ = forward(model2, tokens, c2, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6
        )
