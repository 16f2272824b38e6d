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
