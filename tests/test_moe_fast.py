"""MoE decode fast path: selected-experts evaluation must equal the
dense all-experts path, and the scalar-prefetch kernel must match the
stacked-weight oracle."""

import os

import numpy as np

import jax.numpy as jnp

from vptq_tpu.layers.runtime import Int8Linear, stack_experts
from vptq_tpu.models.llama import (
    Mlp,
    MoeMlp,
    _moe_fast,
    _moe_mlp,
)
from vptq_tpu.layers.dense import DenseLinear


def _int8_linear(rng, out_f, in_f, group):
    in_p = in_f + ((-in_f) % group)
    wq = rng.integers(-127, 128, (out_f, in_p)).astype(np.int8)
    scales = (
        0.01 * (1 + rng.random((in_p // group, out_f)))
    ).astype(np.float32)
    return Int8Linear(
        wq=jnp.asarray(wq), scales=jnp.asarray(scales), bias=None
    )


def _experts(rng, n, hidden, inter, group=512):
    return tuple(
        Mlp(
            gate_proj=None,
            up_proj=None,
            down_proj=_int8_linear(rng, hidden, inter, group),
            gate_up_proj=_int8_linear(rng, 2 * inter, hidden, group),
        )
        for _ in range(n)
    )


def test_stack_experts_builds():
    rng = np.random.default_rng(0)
    experts = _experts(rng, 4, 512, 1024)
    st = stack_experts(experts)
    assert st is not None
    assert st.gate_up_wq.shape[0] == 4
    # mixed families refuse to stack
    bad = experts[:3] + (
        Mlp(
            gate_proj=None, up_proj=None,
            down_proj=DenseLinear(
                weight=jnp.zeros((512, 1024), jnp.bfloat16)
            ),
            gate_up_proj=experts[0].gate_up_proj,
        ),
    )
    assert stack_experts(bad) is None


def test_moe_fast_matches_dense():
    rng = np.random.default_rng(1)
    hidden, inter, E, k = 512, 1024, 4, 2
    experts = _experts(rng, E, hidden, inter)
    router = DenseLinear(
        weight=jnp.asarray(
            0.1 * rng.standard_normal((E, hidden)), jnp.float32
        )
    )
    st = stack_experts(experts)
    moe_dense = MoeMlp(
        router=router, experts=experts, num_experts_per_tok=k,
        stacked=None,
    )
    moe_fast = MoeMlp(
        router=router, experts=experts, num_experts_per_tok=k,
        stacked=st,
    )
    x = jnp.asarray(
        rng.standard_normal((1, 2, hidden)), jnp.float32
    )  # 2 tokens <= fast-path cap
    dense = np.asarray(_moe_mlp(moe_dense, x))
    fast = np.asarray(_moe_mlp(moe_fast, x))
    # f32 reduction order differs (batched-pairs einsum vs per-expert
    # dots); outputs are O(1e4) so compare relative
    np.testing.assert_allclose(dense, fast, rtol=5e-3, atol=5e-2)


def test_moe_fast_prefill_uses_dense_path():
    rng = np.random.default_rng(2)
    hidden, inter, E, k = 256, 512, 4, 2
    experts = _experts(rng, E, hidden, inter)
    router = DenseLinear(
        weight=jnp.asarray(
            0.1 * rng.standard_normal((E, hidden)), jnp.float32
        )
    )
    st = stack_experts(experts)
    moe = MoeMlp(
        router=router, experts=experts, num_experts_per_tok=k,
        stacked=st,
    )
    # 128 tokens > cap (64): must still be correct (dense path)
    x = jnp.asarray(
        rng.standard_normal((1, 128, hidden)), jnp.float32
    )
    dense = np.asarray(
        _moe_mlp(
            MoeMlp(
                router=router, experts=experts,
                num_experts_per_tok=k, stacked=None,
            ),
            x,
        )
    )
    got = np.asarray(_moe_mlp(moe, x))
    np.testing.assert_allclose(dense, got, rtol=1e-5, atol=1e-5)


def test_w8_matmul_expert_interpret():
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w8_matmul_expert

        rng = np.random.default_rng(3)
        E, out_f, in_f, group = 3, 320, 1024, 512
        wq = rng.integers(-127, 128, (E, out_f, in_f)).astype(np.int8)
        scales = (
            0.01 * (1 + rng.random((E, in_f // group, out_f)))
        ).astype(np.float32)
        x = rng.standard_normal((2, in_f)).astype(np.float32)
        for e in range(E):
            got = np.asarray(
                w8_matmul_expert(
                    jnp.asarray(x),
                    jnp.asarray(wq),
                    jnp.asarray(scales),
                    jnp.asarray(e, jnp.int32),
                    out_tile=256,
                    in_tile=512,
                    out_dtype=jnp.float32,
                )
            )
            w = (
                wq[e].astype(np.float32).reshape(out_f, -1, group)
                * scales[e].T[:, :, None]
            ).reshape(out_f, in_f)
            want = (
                x.astype(np.float32)
                @ w.T
            )
            np.testing.assert_allclose(
                got, want, rtol=0.02, atol=0.02 * np.abs(want).max()
            )
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


def test_mixtral_model_fast_path_end_to_end():
    """Full model: fused+stacked MoE decode == unfused dense decode."""
    import tempfile

    from vptq_tpu.models import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_checkpoint(
            d,
            tiny_model_config(
                model_type="mixtral",
                num_local_experts=4,
                num_experts_per_tok=2,
            ),
            vq_kwargs=dict(
                vector_len=4, num_centroids=64, num_res_centroids=16,
                enable_norm=True, is_indice_packed=True,
            ),
            seed=81,
        )
        m_dense = load_model(d, dtype=jnp.float32,
                             runtime_format="int8", fuse=False)
        m_fast = load_model(d, dtype=jnp.float32,
                            runtime_format="int8", fuse=True)
    has_stacked = any(
        getattr(b.mlp, "stacked", None) is not None
        for b in m_fast.blocks
    )
    assert has_stacked
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    # decode one token at a time (fast path) vs dense
    c1 = init_cache(m_dense.cfg, 1, 8, jnp.float32)
    c2 = init_cache(m_fast.cfg, 1, 8, jnp.float32)
    for t in range(3):
        tok = tokens[:, t: t + 1]
        l1, c1 = forward(m_dense, tok, c1, dtype=jnp.float32)
        l2, c2 = forward(m_fast, tok, c2, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=2e-3, atol=2e-3
        )


def _int4_linear(rng, out_f, in_f):
    from vptq_tpu.layers.runtime import Int4Linear
    from vptq_tpu.ops.packing import pack_int4, quantize_int4

    in_p = in_f + ((-in_f) % 2048)
    w = rng.standard_normal((out_f, in_p)).astype(np.float32) * 0.02
    q, s = quantize_int4(w)
    return Int4Linear(
        wq=jnp.asarray(pack_int4(q)),
        scales=jnp.asarray(np.ascontiguousarray(s.T), jnp.bfloat16),
        bias=None,
    )


def test_moe_fast_int4_matches_dense():
    from vptq_tpu.layers.runtime import stack_experts

    rng = np.random.default_rng(11)
    hidden, inter, E, k = 2048, 2048, 4, 2
    experts = tuple(
        Mlp(
            gate_proj=None,
            up_proj=None,
            down_proj=_int4_linear(rng, hidden, inter),
            gate_up_proj=_int4_linear(rng, 2 * inter, hidden),
        )
        for _ in range(E)
    )
    router = DenseLinear(
        weight=jnp.asarray(
            0.1 * rng.standard_normal((E, hidden)), jnp.float32
        )
    )
    st = stack_experts(experts)
    assert st is not None and st.fmt == "int4"
    x = jnp.asarray(rng.standard_normal((1, 1, hidden)), jnp.float32)
    dense = np.asarray(
        _moe_mlp(
            MoeMlp(router=router, experts=experts,
                   num_experts_per_tok=k, stacked=None),
            x,
        )
    )
    fast = np.asarray(
        _moe_mlp(
            MoeMlp(router=router, experts=experts,
                   num_experts_per_tok=k, stacked=st),
            x,
        )
    )
    np.testing.assert_allclose(dense, fast, rtol=2e-3, atol=2e-3)


def test_w4_matmul_expert_interpret():
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w4_matmul_expert
        from vptq_tpu.ops.packing import (
            pack_int4,
            quantize_int4,
            unpack_int4,
        )

        rng = np.random.default_rng(12)
        E, out_f, in_f = 3, 512, 2048
        wqs, ss = [], []
        for _ in range(E):
            w = rng.standard_normal((out_f, in_f)).astype(np.float32)
            q, s = quantize_int4(w)
            wqs.append(pack_int4(q))
            ss.append(s.T)
        wq = jnp.asarray(np.stack(wqs))
        scales = jnp.asarray(np.stack(ss), jnp.bfloat16)
        x = rng.standard_normal((1, in_f)).astype(np.float32)
        for e in [0, 2]:
            got = np.asarray(
                w4_matmul_expert(
                    jnp.asarray(x), wq, scales,
                    jnp.asarray(e, jnp.int32),
                    out_tile=512, in_tile=2048,
                    out_dtype=jnp.float32,
                )
            )
            q = unpack_int4(np.asarray(wq)[e])
            s = np.asarray(ss[e], np.float32).T  # (out, S)
            w_hat = (
                q.astype(np.float32).reshape(out_f, -1, 128)
                * s[:, :, None]
            ).reshape(out_f, in_f)
            want = x @ w_hat.T
            np.testing.assert_allclose(
                got, want, rtol=0.02, atol=0.02 * np.abs(want).max()
            )
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)
