"""Deployment planner tests (VERDICT r1 item 1d).

The headline capability check: a 70B-geometry (80 layers, 8192
hidden) int4 model sharded 8-way must AOT-compile under the
production PartitionSpecs with per-device weight bytes inside a v5e
HBM budget — the zero-weight-byte dryrun of the reference's
flagship "LLaMA-2 70B @ 2 bit on small devices" capability
(reference README.md:124-125, 278).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vptq_tpu.models.llama import ModelConfig
from vptq_tpu.tools.plan import (
    GEOMETRIES,
    abstract_runtime_model,
    main,
    validate_plan,
)

GiB = 1 << 30


def _cfg(name):
    return ModelConfig(
        **{
            **dict(tie_word_embeddings=False, model_type="llama"),
            **GEOMETRIES[name],
        }
    )


def test_cli_budget_fits():
    assert (
        main(["--geometry", "llama2-7b", "--format", "int4"]) == 0
    )


def test_cli_budget_over():
    # 70B bf16 cannot fit 8 x 16 GiB chips
    assert (
        main(
            [
                "--geometry", "llama2-70b",
                "--format", "bf16",
                "--chips", "8",
            ]
        )
        == 1
    )


def test_abstract_shapes_match_real_encoders(tmp_path):
    """The planner's abstract model must track the real encoders'
    shapes exactly — otherwise its compile/budget evidence is about
    a model that doesn't exist."""
    from vptq_tpu.models.loader import load_model
    from vptq_tpu.utils.synth_checkpoint import (
        write_synthetic_checkpoint,
    )

    root = write_synthetic_checkpoint(str(tmp_path / "ckpt"))
    for fmt in ("int8", "int4", "bf16"):
        real = load_model(
            str(root), runtime_format=fmt, quantize_lm_head=True
        )
        abstract = abstract_runtime_model(
            real.cfg, fmt, quantize_lm_head=True
        )
        r_leaves = jax.tree_util.tree_leaves(real)
        a_leaves = jax.tree_util.tree_leaves(abstract)
        assert len(r_leaves) == len(a_leaves), fmt
        for r, a in zip(r_leaves, a_leaves):
            assert tuple(r.shape) == tuple(a.shape), (
                fmt, r.shape, a.shape,
            )
            assert r.dtype == a.dtype, (fmt, r.dtype, a.dtype)


@pytest.mark.slow
@pytest.mark.parametrize("parallel", ["tp", "gspmd"])
def test_70b_int4_8way_aot_compiles(parallel):
    """llama2-70b geometry, int4, sharded over an 8-device mesh:
    the full decode step compiles — through BOTH placements (the
    shard_map Megatron serving path and the GSPMD spec path) — and
    XLA's own memory analysis puts per-device arguments well under a
    16 GiB v5e (~4.7 GiB, matching utils/memory.py's prediction)."""
    from vptq_tpu.parallel.sharding import make_mesh
    from vptq_tpu.utils import memory as hbm

    cfg = _cfg("llama2-70b")
    mesh = make_mesh(
        data=1, model=8, devices=np.asarray(jax.devices()[:8])
    )
    compiled = validate_plan(cfg, "int4", mesh, parallel=parallel)
    mem = compiled.memory_analysis()
    assert mem is not None
    per_dev_args = mem.argument_size_in_bytes
    assert per_dev_args < 5.0 * GiB, per_dev_args / GiB
    # planner's analytic estimate agrees with XLA (weights + kv)
    est = hbm.estimate_model_bytes(
        cfg, "int4", tp_shards=8 if parallel == "tp" else 1
    )
    kv = hbm.kv_cache_bytes(cfg, 1, 2048)
    predicted = (est["total"] + kv) / 8
    assert abs(per_dev_args - predicted) / predicted < 0.15, (
        per_dev_args / GiB, predicted / GiB,
    )


def test_deepseek_r1_plan_compiles_8way():
    """DeepSeek-R1 geometry (MLA + 256-expert MoE — the reference's
    flagship deploy target, documents/deepseek.md) at reduced depth:
    both placements AOT-compile sharded 8-way; the full-depth budget
    (32 chips, 11.5 GiB/chip int4) is validated analytically."""
    from vptq_tpu.parallel.sharding import make_mesh
    from vptq_tpu.utils import memory as hbm

    g = dict(GEOMETRIES["deepseek-r1"])
    g["num_hidden_layers"] = 4
    cfg = ModelConfig(**{**dict(tie_word_embeddings=False), **g})
    mesh = make_mesh(
        data=1, model=8, devices=np.asarray(jax.devices()[:8])
    )
    for par in ("tp", "gspmd"):
        compiled = validate_plan(
            cfg, "int4", mesh, max_seq=512, parallel=par
        )
        assert compiled.memory_analysis() is not None

    full = ModelConfig(
        **{**dict(tie_word_embeddings=False), **GEOMETRIES["deepseek-r1"]}
    )
    est = hbm.estimate_model_bytes(full, "int4", tp_shards=32)
    kv = hbm.kv_cache_bytes(full, 1, 2048)
    per_chip = (est["total"] + kv) / 32
    assert per_chip < 13 * GiB, per_chip / GiB


def test_mixtral_moe_plan_compiles_2way():
    """MoE geometry goes through StackedExperts EP specs; a cheap
    2-device compile at reduced depth keeps CI fast while covering
    the MoE planning path."""
    from vptq_tpu.parallel.sharding import make_mesh

    g = dict(GEOMETRIES["mixtral-8x7b"])
    g["num_hidden_layers"] = 2
    cfg = ModelConfig(
        **{**dict(tie_word_embeddings=False), **g}
    )
    mesh = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    compiled = validate_plan(cfg, "int8", mesh, max_seq=256)
    assert compiled.memory_analysis() is not None


@pytest.mark.slow
def test_70b_codebook_2way_plan_compiles():
    """VERDICT r2 item 6: the memory-floor `codebook` format has a
    budget + AOT story — 70B at the community v8-k65536-256 geometry
    fits 2 chips (~13 GiB/chip) and the GSPMD decode step compiles."""
    from vptq_tpu.parallel.sharding import make_mesh
    from vptq_tpu.utils import memory as hbm

    cfg = _cfg("llama2-70b")
    vq = (8, 65536, 256)
    est = hbm.estimate_model_bytes(cfg, "codebook", default_vq=vq)
    kv = hbm.kv_cache_bytes(cfg, 1, 2048)
    per_chip = (est["total"] + kv) / 2
    assert per_chip < 0.9 * 16 * GiB, per_chip / GiB

    mesh = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    compiled = validate_plan(
        cfg, "codebook", mesh, max_seq=512, vq=vq
    )
    mem = compiled.memory_analysis()
    assert mem is not None
    # analytic estimate vs XLA argument bytes
    est_kv = hbm.kv_cache_bytes(cfg, 1, 512)
    predicted = (est["total"] + est_kv) / 2
    assert (
        abs(mem.argument_size_in_bytes - predicted) / predicted < 0.15
    )


def test_int3_tp_plan_compiles_2way():
    """int3 under shard_map TP: the blocked-plane plan compiles."""
    from vptq_tpu.parallel.sharding import make_mesh

    cfg = _cfg("llama2-7b")
    mesh = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    compiled = validate_plan(
        cfg, "int3", mesh, max_seq=256, parallel="tp"
    )
    assert compiled.memory_analysis() is not None


def test_codebook_plan_rejects_tp():
    from vptq_tpu.parallel.sharding import make_mesh

    cfg = _cfg("llama2-7b")
    mesh = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    with pytest.raises(ValueError, match="gspmd"):
        validate_plan(cfg, "codebook", mesh, parallel="tp")


def test_parse_vq():
    from vptq_tpu.tools.plan import parse_vq

    assert parse_vq("v8-k65536-256") == (8, 65536, 256)
    assert parse_vq("v8-k65536-0") == (8, 65536, 0)
    with pytest.raises(ValueError):
        parse_vq("8-65536")


def test_predict_decode_backcasts_7b_benches():
    """The decode cost model must reproduce the measured single-chip
    7B benches within 5% (rates are fitted at 7B int8; int4/int3
    split lm_head traffic differently, so agreement is not purely
    circular) and behave sanely across chips/batch."""
    from vptq_tpu.tools.plan import GEOMETRIES, predict_decode_tok_s

    cfg = ModelConfig(
        **{
            **dict(tie_word_embeddings=False, model_type="llama"),
            **GEOMETRIES["llama2-7b"],
        }
    )
    measured = {"int8": 92.31, "int4": 153.0, "int3": 62.3}
    for fmt, want in measured.items():
        got = predict_decode_tok_s(cfg, fmt, max_seq=264)
        assert abs(got - want) / want < 0.05, (fmt, got, want)

    # more chips -> faster (weight stream splits), but sublinear
    # (collective latency)
    c70 = ModelConfig(
        **{
            **dict(tie_word_embeddings=False, model_type="llama"),
            **GEOMETRIES["llama2-70b"],
        }
    )
    one = predict_decode_tok_s(c70, "int3", chips=1)
    two = predict_decode_tok_s(c70, "int3", chips=2)
    four = predict_decode_tok_s(c70, "int3", chips=4)
    assert one < two < four
    assert four < 4 * one

    # MoE decode streams only the routed fraction: mixtral int4 at
    # batch 1 must beat a dense model of the same total bytes
    mx = ModelConfig(
        **{
            **dict(tie_word_embeddings=False),
            **GEOMETRIES["mixtral-8x7b"],
        }
    )
    moe = predict_decode_tok_s(mx, "int4")
    assert moe > predict_decode_tok_s(c70, "int4")  # 47B total, 13B active


def test_flagship_405b_int2_mixed_64chip_plan_compiles():
    """BASELINE configs #5: Llama-3.1-405B at the sub-3-bit operating
    point over a two-level DCN(data) x ICI(pp x tp) mesh — the exact
    VERDICT r4 item 4 command. Auto-placement must cap TP at the
    GQA kv-head count (8) and absorb the rest of the slice into
    pipeline stages; one full-width 32-layer stage AOT-compiles at
    tp=8 on the virtual mesh."""
    assert (
        main(
            [
                "--geometry", "llama3-405b",
                "--format", "int2-mixed",
                "--chips", "64",
                "--hosts", "2",
                "--compile",
            ]
        )
        == 0
    )


def test_flagship_mistral_large_123b_plan():
    """BASELINE configs #5 alternative: Mistral-Large-123B @ ~2.5
    bits on 2 DCN slices x tp=8 (no pipeline needed — 123B fits an
    8-chip slice at 5 GiB/chip)."""
    assert (
        main(
            [
                "--geometry", "mistral-large-123b",
                "--format", "int2-mixed",
                "--chips", "16",
                "--hosts", "2",
            ]
        )
        == 0
    )


def test_int2_abstract_shapes_match_real_encoder():
    """The planner's abstract Int2Linear must track _encode_int2's
    real shapes (single-device and blocked-TP layouts)."""
    import jax

    from vptq_tpu.layers.runtime import _encode_int2
    from vptq_tpu.tools.plan import _abs_linear

    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.02, (192, 1536)).astype(np.float32)
    real = _encode_int2(w, None)
    ab = _abs_linear(1536, 192, "int2")
    assert jax.eval_shape(lambda: real.wq).shape == ab.wq.shape
    assert (
        jax.eval_shape(lambda: real.scales).shape == ab.scales.shape
    )

    real_b = _encode_int2(w, None, shards=2)
    ab_b = _abs_linear(1536, 192, "int2", row_shards=2)
    assert jax.eval_shape(lambda: real_b.wq).shape == ab_b.wq.shape
    assert (
        jax.eval_shape(lambda: real_b.scales).shape
        == ab_b.scales.shape
    )
