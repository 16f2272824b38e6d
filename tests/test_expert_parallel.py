"""Expert parallelism: batched pairs kernels, stacked-backed dense
path, and EP shard_map dispatch on an 8-device CPU mesh.

VERDICT r1 item 3: sharded MoE decode must keep the selected-experts
fast path (reading only the routed top-k experts' bytes per device)
and match single-device outputs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vptq_tpu.layers.runtime import Int8Linear, stack_experts
from vptq_tpu.models.llama import (
    Mlp,
    MoeMlp,
    _moe_fast,
    _moe_mlp,
)
from vptq_tpu.layers.dense import DenseLinear


def _int8_linear(rng, out_f, in_f, group=512):
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


# ------------------------------------------------------- pairs kernels


def test_w8_matmul_pairs_interpret():
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.pallas_gemm import w8_matmul_pairs

        rng = np.random.default_rng(3)
        E, out_f, in_f, group = 4, 320, 1024, 512
        wq = rng.integers(-127, 128, (E, out_f, in_f)).astype(np.int8)
        scales = (
            0.01 * (1 + rng.random((E, in_f // group, out_f)))
        ).astype(np.float32)
        n_pairs = 6
        ids = rng.integers(0, E, n_pairs).astype(np.int32)
        x = rng.standard_normal((n_pairs, in_f)).astype(np.float32)

        got = np.asarray(
            w8_matmul_pairs(
                jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scales),
                jnp.asarray(ids),
                out_tile=256, in_tile=512, out_dtype=jnp.float32,
            )
        )
        for p in range(n_pairs):
            e = ids[p]
            w = (
                wq[e].astype(np.float32).reshape(out_f, -1, group)
                * scales[e].T[:, :, None]
            ).reshape(out_f, in_f)
            want = x[p].astype(np.float32) @ w.T
            np.testing.assert_allclose(
                got[p], want, rtol=0.02, atol=0.02 * np.abs(want).max()
            )
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


def test_w4_matmul_pairs_interpret():
    os.environ["VPTQ_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from vptq_tpu.ops.packing import pack_int4, quantize_int4
        from vptq_tpu.ops.pallas_gemm import w4_matmul_pairs

        rng = np.random.default_rng(5)
        # in_tile must be 2048 (scale-slice sublane offsets must be
        # 8-divisible — see w4_matmul_pairs / mosaic lowering rules)
        E, out_f, in_f = 3, 256, 2048
        ws, packed, scales = [], [], []
        for e in range(E):
            w = rng.normal(0, 0.02, (out_f, in_f)).astype(np.float32)
            q, s = quantize_int4(w)
            ws.append(
                (
                    q.astype(np.float32).reshape(out_f, -1, 128)
                    * s[:, :, None]
                ).reshape(out_f, in_f)
            )
            packed.append(pack_int4(q))
            scales.append(s.T)
        wq = jnp.asarray(np.stack(packed))
        sc = jnp.asarray(np.stack(scales), jnp.bfloat16)
        n_pairs = 5
        ids = rng.integers(0, E, n_pairs).astype(np.int32)
        x = rng.standard_normal((n_pairs, in_f)).astype(np.float32)

        got = np.asarray(
            w4_matmul_pairs(
                jnp.asarray(x), wq, sc, jnp.asarray(ids),
                out_tile=256, in_tile=2048, out_dtype=jnp.float32,
            )
        )
        xb = np.asarray(
            jnp.asarray(x, jnp.bfloat16), np.float32
        )
        for p in range(n_pairs):
            want = xb[p] @ ws[ids[p]].T
            np.testing.assert_allclose(
                got[p], want, rtol=0.03,
                atol=0.03 * np.abs(want).max(),
            )
    finally:
        os.environ.pop("VPTQ_TPU_PALLAS_INTERPRET", None)


# ------------------------------------------- stacked-only dense path


def test_stacked_dense_path_matches_experts():
    """MoeMlp with experts dropped (weights exist once in HBM) must
    match the per-expert dense path at prefill token counts."""
    rng = np.random.default_rng(1)
    hidden, inter, E, k = 256, 512, 4, 2
    experts = _experts(rng, E, hidden, inter)
    router = DenseLinear(
        weight=jnp.asarray(
            0.1 * rng.standard_normal((E, hidden)), jnp.float32
        )
    )
    st = stack_experts(experts)
    with_experts = MoeMlp(
        router=router, experts=experts, num_experts_per_tok=k,
        stacked=None,
    )
    stacked_only = MoeMlp(
        router=router, experts=(), num_experts_per_tok=k, stacked=st
    )
    x = jnp.asarray(
        rng.standard_normal((1, 128, hidden)), jnp.float32
    )  # > fast-path cap => dense path
    a = np.asarray(_moe_mlp(with_experts, x))
    b = np.asarray(_moe_mlp(stacked_only, x))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-2)


def test_moe_fast_large_batch():
    """The batched pairs path handles batch sizes the round-1 loop
    could not (cap raised 8 -> 64)."""
    rng = np.random.default_rng(2)
    hidden, inter, E, k = 256, 512, 8, 2
    experts = _experts(rng, E, hidden, inter)
    st = stack_experts(experts)
    n = 48  # > old cap of 8
    x = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, E, (n, k)), jnp.int32)
    ws = jnp.asarray(rng.random((n, k)), jnp.float32)
    got = np.asarray(_moe_fast(st, x, ids, ws))

    # oracle: per-token, per-expert dense evaluation
    want = np.zeros((n, hidden), np.float32)
    from vptq_tpu.models.llama import _stacked_expert_mlp

    for t in range(n):
        for j in range(k):
            d = np.asarray(
                _stacked_expert_mlp(
                    st, x[t: t + 1], jnp.asarray(ids[t, j])
                )
            )
            want[t] += float(ws[t, j]) * d[0, :hidden]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-2)


# ------------------------------------------------------------- EP mesh


@pytest.fixture(scope="module")
def cpu_mesh8():
    from vptq_tpu.parallel import make_mesh

    if len(jax.devices()) < 8 or jax.devices()[0].platform != "cpu":
        pytest.skip("needs the 8-device CPU mesh (conftest forces it)")
    return make_mesh(data=1, devices=jax.devices()[:8])


def _ep_moe(rng, mesh, hidden=256, inter=512, E=8, k=2):
    experts = _experts(rng, E, hidden, inter)
    router = DenseLinear(
        weight=jnp.asarray(
            0.1 * rng.standard_normal((E, hidden)), jnp.float32
        )
    )
    st = stack_experts(experts)
    single = MoeMlp(
        router=router, experts=(), num_experts_per_tok=k, stacked=st
    )
    from vptq_tpu.parallel.expert_parallel import shard_stacked_experts

    st_ep = shard_stacked_experts(st, mesh, "model")
    assert st_ep is not None
    ep = MoeMlp(
        router=router, experts=(), num_experts_per_tok=k,
        stacked=st_ep, ep_mesh=mesh,
    )
    return single, ep


def test_ep_decode_matches_single_device(cpu_mesh8):
    rng = np.random.default_rng(7)
    single, ep = _ep_moe(rng, cpu_mesh8)
    x = jnp.asarray(
        rng.standard_normal((2, 1, 256)), jnp.float32
    )  # decode shape: fast path
    with cpu_mesh8:
        got = np.asarray(jax.jit(_moe_mlp)(ep, x))
    want = np.asarray(jax.jit(_moe_mlp)(single, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_ep_prefill_matches_single_device(cpu_mesh8):
    rng = np.random.default_rng(8)
    single, ep = _ep_moe(rng, cpu_mesh8)
    x = jnp.asarray(
        rng.standard_normal((1, 96, 256)), jnp.float32
    )  # > fast cap: dense EP path
    with cpu_mesh8:
        got = np.asarray(jax.jit(_moe_mlp)(ep, x))
    want = np.asarray(jax.jit(_moe_mlp)(single, x))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-2)


def test_shard_model_sets_ep(cpu_mesh8):
    """shard_model on a fused Mixtral-style model keeps the stacked
    fast path, drops per-expert copies, and sets the EP mesh."""
    import tempfile

    from vptq_tpu.models import load_model
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.parallel import shard_cache, shard_model
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_checkpoint(
            d,
            tiny_model_config(
                model_type="mixtral",
                num_local_experts=8,
                num_experts_per_tok=2,
                num_attention_heads=8,
                num_key_value_heads=8,
            ),
            vq_kwargs=dict(
                vector_len=4, num_centroids=64, num_res_centroids=16,
                enable_norm=True, is_indice_packed=True,
            ),
            seed=91,
        )
        model = load_model(d, dtype=jnp.float32, runtime_format="int8")
    assert all(b.mlp.stacked is not None for b in model.blocks)
    assert all(b.mlp.experts == () for b in model.blocks)

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    c0 = init_cache(model.cfg, 1, 8, jnp.float32)
    want, _ = forward(model, tokens, c0, dtype=jnp.float32)

    mesh = cpu_mesh8
    sharded = shard_model(model, mesh)
    for b in sharded.blocks:
        assert b.mlp.ep_mesh is mesh
        assert b.mlp.stacked is not None
        # expert dim really is sharded over the mesh
        spec = b.mlp.stacked.gate_up_wq.sharding.spec
        assert spec[0] == "model"
    with mesh:
        c1 = shard_cache(
            init_cache(model.cfg, 1, 8, jnp.float32), mesh
        )
        step = jax.jit(
            lambda m, t, c: forward(m, t, c, dtype=jnp.float32)
        )
        got, _ = step(sharded, tokens, c1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
