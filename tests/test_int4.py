"""int4 runtime format: packing, kernel semantics, model plumbing."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vptq_tpu.layers.runtime import (
    Int4Linear,
    _exact_weight,
    fuse_linears,
    to_int4,
)
from vptq_tpu.ops.packing import pack_int4, quantize_int4, unpack_int4
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


def test_pack_int4_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (48, 512)).astype(np.int8)
    p = pack_int4(q)
    assert p.shape == (48, 256)
    assert (unpack_int4(p) == q).all()


def test_quantize_int4_scale_is_bf16_exact():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.02, (32, 256)).astype(np.float32)
    q, s = quantize_int4(w)
    # scales must survive the bf16 storage round-trip unchanged
    assert (s == np.asarray(jnp.asarray(s, jnp.bfloat16), np.float32)).all()
    assert q.min() >= -7 and q.max() <= 7


def test_int4_reencode_error_bound():
    layer = _mk_layer()
    w = _exact_weight(layer)
    rt = to_int4(layer)
    q = unpack_int4(np.asarray(rt.wq))
    s = np.asarray(rt.scales, dtype=np.float32).T  # (out, S)
    w_hat = (
        q.astype(np.float32).reshape(w.shape[0], -1, 128)
        * s[:, :, None]
    ).reshape(w.shape[0], -1)[:, : w.shape[1]]
    rel = np.sqrt(np.mean((w_hat - w) ** 2)) / np.sqrt(np.mean(w**2))
    # int4 with MSE-optimal scales: ~10.5% weight RMS (document, don't
    # hide; logit/PPL-level evidence lives in tests/test_fidelity.py)
    assert rel < 0.12, rel


def test_int4_apply_matches_dequant_matmul():
    layer = _mk_layer()
    rt = to_int4(layer)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.normal(0, 1, (4, layer.cfg.in_features)), jnp.float32
    )
    got = np.asarray(rt(x), dtype=np.float32)

    q = unpack_int4(np.asarray(rt.wq))
    s = np.asarray(rt.scales, dtype=np.float32).T  # (out, S)
    w_hat = (
        q.astype(np.float32).reshape(q.shape[0], -1, 128)
        * s[:, :, None]
    ).reshape(q.shape[0], -1)[:, : layer.cfg.in_features]
    want = np.asarray(x) @ w_hat.T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("in_tile", [256, 512, 1024])
def test_w4_matmul_interpret_matches_oracle(in_tile):
    """Pallas kernel (interpreter mode) vs host dequant matmul.

    Covers the small in_tiles the shard_map TP blocked shards use
    (scales are streamed pre-blocked per in-step)."""
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w4_matmul

        rng = np.random.default_rng(5)
        out_f, in_f = 320, 1024  # out not a multiple of out_tile
        w = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
        q, s = quantize_int4(w)
        packed = jnp.asarray(pack_int4(q))
        scales = jnp.asarray(s.T.copy(), jnp.bfloat16)  # (S, out)
        x = jnp.asarray(
            rng.normal(0, 1, (3, in_f)), jnp.float32
        )

        got = np.asarray(
            w4_matmul(
                x, packed, scales, out_tile=256, in_tile=in_tile,
                out_dtype=jnp.float32,
            )
        )
        w_hat = (
            q.astype(np.float32).reshape(out_f, -1, 128) * s[:, :, None]
        ).reshape(out_f, in_f)
        want = np.asarray(
            jnp.asarray(np.asarray(x), jnp.bfloat16), np.float32
        ) @ w_hat.T
        np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


def test_int4_fuse_linears():
    a = to_int4(_mk_layer(seed=1))
    b = to_int4(_mk_layer(seed=2))
    fused = fuse_linears([a, b])
    assert isinstance(fused, Int4Linear)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 640)), jnp.float32)
    got = np.asarray(fused(x))
    want = np.concatenate(
        [np.asarray(a(x)), np.asarray(b(x))], axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_int4_model_end_to_end_logits_close():
    """int4 model runs and stays close to the bf16 reference model."""
    import tempfile

    from vptq_tpu.utils.synth_checkpoint import write_synthetic_checkpoint

    from vptq_tpu.models.loader import load_model
    from vptq_tpu.models.llama import forward, init_cache

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_checkpoint(d, seed=11)
        m16 = load_model(d, runtime_format="bf16")
        m4 = load_model(d, runtime_format="int4")
        tokens = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        c16 = init_cache(m16.cfg, 1, 16)
        c4 = init_cache(m4.cfg, 1, 16)
        l16, _ = forward(m16, tokens, c16)
        l4, _ = forward(m4, tokens, c4)
        a, b = np.asarray(l16), np.asarray(l4)
        # int4-RTN noise on a tiny *random* synthetic model compounds
        # much harder than on a real trained model — this is a
        # plumbing check (loads, runs, correlates), not a fidelity
        # bound; fidelity is covered per-layer in
        # test_int4_reencode_error_bound.
        cos = np.sum(a * b) / (
            np.linalg.norm(a) * np.linalg.norm(b) + 1e-9
        )
        assert cos > 0.75, cos


def test_int4_export_import_roundtrip(tmp_path):
    import tempfile

    from vptq_tpu.utils.synth_checkpoint import write_synthetic_checkpoint

    from vptq_tpu.models.loader import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.tools.export_runtime import (
        export_runtime,
        load_runtime_model,
    )

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_checkpoint(d, seed=13)
        m4 = load_model(d, runtime_format="int4")
    export_runtime(m4, tmp_path / "rt")
    m4b = load_runtime_model(tmp_path / "rt")
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    la, _ = forward(m4, tokens, init_cache(m4.cfg, 1, 8))
    lb, _ = forward(m4b, tokens, init_cache(m4b.cfg, 1, 8))
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-5
    )
