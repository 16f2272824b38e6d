"""Multi-device GSPMD: sharded models must reproduce single-device
outputs exactly, for every runtime format, on a real 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.parallel import make_mesh, shard_cache, shard_model
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("shard_ckpt")
    write_synthetic_checkpoint(
        path,
        tiny_model_config(
            hidden_size=64,
            num_attention_heads=8,
            num_key_value_heads=8,  # divisible by model axis (4)
            head_dim=8,
            intermediate_size=128,
        ),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=51,
    )
    return path


@pytest.mark.parametrize("fmt", ["bf16", "int8", "codebook"])
def test_sharded_forward_matches_single(ckpt, fmt):
    model = load_model(str(ckpt), dtype=jnp.float32,
                       runtime_format=fmt)
    tokens = jnp.asarray([[3, 1, 4, 1], [5, 9, 2, 6]], jnp.int32)

    cache = init_cache(model.cfg, 2, 8, jnp.float32)
    ref, ref_cache = forward(model, tokens, cache, dtype=jnp.float32)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        smodel = shard_model(model, mesh)
        scache = shard_cache(
            init_cache(model.cfg, 2, 8, jnp.float32), mesh
        )
        step = jax.jit(lambda m, t, c: forward(m, t, c,
                                               dtype=jnp.float32))
        out, out_cache = step(smodel, tokens, scache)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_cache.lengths), np.asarray(ref_cache.lengths)
    )


def test_sharded_decode_loop(ckpt):
    from vptq_tpu.serving.generate import decode_loop

    model = load_model(str(ckpt), dtype=jnp.float32,
                       runtime_format="bf16")
    mesh = make_mesh(data=1, model=8)
    with mesh:
        smodel = shard_model(model, mesh)
        cache = shard_cache(
            init_cache(model.cfg, 1, 16, jnp.float32), mesh
        )
        toks, cache = decode_loop(
            smodel,
            jnp.asarray([7], jnp.int32),
            cache,
            jax.random.PRNGKey(0),
            jnp.asarray(0.0, jnp.float32),
            steps=6,
            dtype=jnp.float32,
        )
    # must equal the unsharded decode
    cache1 = init_cache(model.cfg, 1, 16, jnp.float32)
    ref, _ = decode_loop(
        model,
        jnp.asarray([7], jnp.int32),
        cache1,
        jax.random.PRNGKey(0),
        jnp.asarray(0.0, jnp.float32),
        steps=6,
        dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_sharded_deepseek_matches_single(tmp_path):
    """MLA attention + DeepSeek MoE under TP (shard_model must handle
    the non-GQA module types)."""
    from tests.test_deepseek import DS_CFG, VQ

    write_synthetic_checkpoint(
        tmp_path, tiny_model_config(**DS_CFG), vq_kwargs=VQ, seed=57
    )
    model = load_model(str(tmp_path), dtype=jnp.float32,
                       runtime_format="int8")
    tokens = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    cache = init_cache(model.cfg, 1, 8, jnp.float32)
    ref, _ = forward(model, tokens, cache, dtype=jnp.float32)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        smodel = shard_model(model, mesh)
        scache = shard_cache(
            init_cache(model.cfg, 1, 8, jnp.float32), mesh
        )
        step = jax.jit(
            lambda m, t, c: forward(m, t, c, dtype=jnp.float32)
        )
        got, _ = step(smodel, tokens, scache)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sharded_mixtral_matches_single(tmp_path):
    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(
            model_type="mixtral",
            num_local_experts=4,
            num_experts_per_tok=2,
        ),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=58,
    )
    model = load_model(str(tmp_path), dtype=jnp.float32,
                       runtime_format="int8")
    tokens = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    cache = init_cache(model.cfg, 1, 8, jnp.float32)
    ref, _ = forward(model, tokens, cache, dtype=jnp.float32)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        smodel = shard_model(model, mesh)
        scache = shard_cache(
            init_cache(model.cfg, 1, 8, jnp.float32), mesh
        )
        step = jax.jit(
            lambda m, t, c: forward(m, t, c, dtype=jnp.float32)
        )
        got, _ = step(smodel, tokens, scache)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
