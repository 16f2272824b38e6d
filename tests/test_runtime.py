"""Runtime re-encoding formats: error bounds and kernel semantics."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.layers.runtime import Int8Linear, to_bf16, to_int8
from vptq_tpu.layers.runtime import _exact_weight
from vptq_tpu.utils.synth import make_config, make_layer


def _mk_layer():
    cfg = make_config(
        in_features=640,
        out_features=192,
        vector_len=8,
        num_centroids=1024,
        num_res_centroids=64,
        enable_norm=True,
        enable_perm=True,
    )
    return make_layer(cfg, seed=9)


def test_int8_reencode_error_bound():
    layer = _mk_layer()
    w = _exact_weight(layer)
    rt = to_int8(layer, group=512)
    wq = np.asarray(rt.wq, dtype=np.float32)
    scales = np.asarray(rt.scales)
    w_hat = (
        wq.reshape(w.shape[0], -1, 512) * scales.T[:, :, None]
    ).reshape(w.shape[0], -1)[:, : w.shape[1]]

    rel_rms = np.sqrt(np.mean((w_hat - w) ** 2)) / np.sqrt(
        np.mean(w**2)
    )
    # int8 per-group error is ~0.2-0.5% RMS — two orders of magnitude
    # inside the reference's kernel tolerance (rtol=atol=0.2,
    # reference tests/test_quant_gemv.py:183).
    assert rel_rms < 0.01, rel_rms


def test_bf16_reencode_exact():
    layer = _mk_layer()
    w = _exact_weight(layer)
    rt = to_bf16(layer)
    w_hat = np.asarray(rt.weight, dtype=np.float32)
    # bf16 rounding only
    assert np.max(np.abs(w_hat - w)) <= np.max(np.abs(w)) * 2**-8


def test_int8_apply_matches_exact_matmul():
    layer = _mk_layer()
    w = _exact_weight(layer)
    rt = to_int8(layer)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, layer.cfg.in_features)).astype(np.float32)
    y_exact = x @ w.T
    y_rt = np.asarray(rt(jnp.asarray(x)))
    rel = np.max(np.abs(y_rt - y_exact)) / np.max(np.abs(y_exact))
    assert rel < 0.02, rel


def test_w8_kernel_interpret_matches_fallback():
    """Pallas kernel semantics (interpreter mode) == XLA fallback."""
    from vptq_tpu.ops.pallas_gemm import w8_matmul

    rng = np.random.default_rng(0)
    OUT, IN, G = 128, 1024, 512
    wq = jnp.asarray(
        rng.integers(-127, 128, size=(OUT, IN)), jnp.int8
    )
    scales = jnp.asarray(
        0.01 * (1 + rng.random((IN // G, OUT))), jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((2, IN)), jnp.float32)

    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        y = w8_matmul(
            x, wq, scales, out_tile=128, in_tile=G,
            out_dtype=jnp.float32,
        )
    finally:
        os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "0"

    w = (
        np.asarray(wq, np.float32).reshape(OUT, IN // G, G)
        * np.asarray(scales).T[:, :, None]
    ).reshape(OUT, IN)
    y_ref = np.asarray(x) @ w.T
    # bf16 accumulation noise is absolute (~|x||w| * 2^-8), so scale
    # atol by the output magnitude.
    atol = 5e-3 * float(np.max(np.abs(y_ref)))
    np.testing.assert_allclose(
        np.asarray(y), y_ref, rtol=2e-2, atol=atol
    )


def test_load_model_runtime_formats(tmp_path):
    from vptq_tpu.models import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=3,
    )
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    outs = {}
    for fmt in ("codebook", "int8", "bf16"):
        model = load_model(str(tmp_path), dtype=jnp.float32,
                           runtime_format=fmt)
        cache = init_cache(model.cfg, 1, 8, jnp.float32)
        logits, _ = forward(model, tokens, cache, dtype=jnp.float32)
        outs[fmt] = np.asarray(logits)

    np.testing.assert_allclose(
        outs["bf16"], outs["codebook"], rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        outs["int8"], outs["codebook"], rtol=5e-2, atol=5e-2
    )


def test_fused_model_matches_unfused(tmp_path):
    from vptq_tpu.layers.runtime import fuse_model
    from vptq_tpu.models import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=5,
    )
    model = load_model(
        str(tmp_path), dtype=jnp.float32, runtime_format="int8",
        fuse=False,
    )
    fused = fuse_model(model)
    assert fused.blocks[0].attn.qkv_proj is not None
    assert fused.blocks[0].mlp.gate_up_proj is not None

    tokens = jnp.asarray([[2, 7, 11, 3]], jnp.int32)
    cache = init_cache(model.cfg, 1, 8, jnp.float32)
    logits, _ = forward(model, tokens, cache, dtype=jnp.float32)
    cache = init_cache(model.cfg, 1, 8, jnp.float32)
    logits_f, _ = forward(fused, tokens, cache, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_f), rtol=1e-4, atol=1e-4
    )


def test_quantize_lm_head(tmp_path):
    from vptq_tpu.layers.runtime import Int8Linear
    from vptq_tpu.models import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(tie_word_embeddings=False),
        vq_kwargs=dict(vector_len=4, num_centroids=64,
                       num_res_centroids=16, is_indice_packed=True),
        seed=131,
    )
    m1 = load_model(str(tmp_path), dtype=jnp.float32,
                    runtime_format="bf16")
    m2 = load_model(str(tmp_path), dtype=jnp.float32,
                    runtime_format="bf16", quantize_lm_head=True)
    assert isinstance(m2.lm_head, Int8Linear)

    tokens = jnp.asarray([[4, 9, 2]], jnp.int32)
    l1, _ = forward(m1, tokens, init_cache(m1.cfg, 1, 8, jnp.float32),
                    dtype=jnp.float32)
    l2, _ = forward(m2, tokens, init_cache(m2.cfg, 1, 8, jnp.float32),
                    dtype=jnp.float32)
    rel = np.max(np.abs(np.asarray(l1) - np.asarray(l2))) / (
        np.max(np.abs(np.asarray(l1))) + 1e-9
    )
    assert rel < 0.02, rel
