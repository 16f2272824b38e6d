"""Pipeline-style layer placement (parallel/pipeline.py) — the
reference's accelerate device_map equivalent."""

import numpy as np

import jax
import jax.numpy as jnp

from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.models.loader import load_model
from vptq_tpu.parallel.pipeline import PipelineRunner, pp_stage_of
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def test_stage_assignment_balanced():
    # 10 layers over 4 stages: 3,3,2,2
    stages = [pp_stage_of(i, 10, 4) for i in range(10)]
    assert stages == [0, 0, 0, 1, 1, 1, 2, 2, 3, 3]
    assert [pp_stage_of(i, 8, 4) for i in range(8)] == [
        0, 0, 1, 1, 2, 2, 3, 3,
    ]


def _roundtrip(tmp_path, fmt, **cfg_kw):
    cfg = tiny_model_config(num_hidden_layers=4, **cfg_kw)
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    model = load_model(
        str(root), dtype=jnp.float32, runtime_format=fmt
    )
    tokens = jnp.asarray([[1, 7, 42]], jnp.int32)

    cache = init_cache(cfg, 1, 16, jnp.float32)
    ref1, cache = forward(model, tokens, cache, dtype=jnp.float32)
    nxt = jnp.argmax(ref1[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = forward(model, nxt, cache, dtype=jnp.float32)

    devices = jax.devices()[:4]
    pp = PipelineRunner(
        model, devices, max_seq=16, dtype=jnp.float32
    )
    # weights really live on their stages
    for s, stage in enumerate(pp.stages):
        leaf = jax.tree.leaves(stage.blocks)[0]
        assert list(leaf.devices())[0] == devices[s], s
    got1 = pp.forward(tokens, fresh=True)
    got2 = pp.forward(nxt)
    # per-stage jits fuse differently than the single-jit forward —
    # expect float-ulp-level differences only
    np.testing.assert_allclose(
        np.asarray(ref1), np.asarray(got1), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref2), np.asarray(got2), rtol=1e-3, atol=1e-5
    )
    assert np.argmax(np.asarray(ref2)[0, -1]) == np.argmax(
        np.asarray(got2)[0, -1]
    )


def test_pp_matches_single_device_int8(tmp_path):
    _roundtrip(tmp_path, "int8")


def test_pp_matches_single_device_tied_embed(tmp_path):
    _roundtrip(tmp_path, "bf16")  # tied embeddings (default config)


def test_pp_pipelined_microbatches(tmp_path):
    """1F microbatch schedule: two 1-row microbatches through 4
    stages equal the plain batched forward, and decode continues
    per-microbatch."""
    cfg = tiny_model_config(num_hidden_layers=4)
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    model = load_model(
        str(root), dtype=jnp.float32, runtime_format="int8"
    )
    tokens = jnp.asarray([[1, 7, 42], [9, 3, 5]], jnp.int32)
    cache = init_cache(cfg, 2, 16, jnp.float32)
    ref, cache = forward(model, tokens, cache, dtype=jnp.float32)

    pp = PipelineRunner(
        model, jax.devices()[:4], max_seq=16, batch=2,
        dtype=jnp.float32,
    )
    outs = pp.forward_pipelined(
        [tokens[0:1], tokens[1:2]], fresh=True
    )
    got = np.concatenate([np.asarray(o) for o in outs], axis=0)
    np.testing.assert_allclose(
        np.asarray(ref), got, rtol=1e-3, atol=1e-5
    )

    # one decode step per microbatch
    nxt = jnp.argmax(ref[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = forward(model, nxt, cache, dtype=jnp.float32)
    outs2 = pp.forward_pipelined([nxt[0:1], nxt[1:2]])
    got2 = np.concatenate([np.asarray(o) for o in outs2], axis=0)
    np.testing.assert_allclose(
        np.asarray(ref2), got2, rtol=1e-3, atol=1e-5
    )


def test_tp_pp_composition_exact(tmp_path):
    """VERDICT r2 item 8: 2 pipeline stages x 4-way TP on the
    8-device mesh — logits match the single-device model, weights
    live sharded on each stage's sub-mesh."""
    from vptq_tpu.parallel.pipeline import TPPipelineRunner

    cfg = tiny_model_config(
        num_hidden_layers=4, num_key_value_heads=4,
        num_attention_heads=4, tie_word_embeddings=False,
    )
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    model = load_model(
        str(root), dtype=jnp.float32, runtime_format="int8"
    )
    tokens = jnp.asarray([[1, 7, 42]], jnp.int32)

    cache = init_cache(cfg, 1, 16, jnp.float32)
    ref1, cache = forward(model, tokens, cache, dtype=jnp.float32)
    nxt = jnp.argmax(ref1[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = forward(model, nxt, cache, dtype=jnp.float32)

    pp = TPPipelineRunner(
        model, jax.devices()[:8], tp=4, max_seq=16,
        dtype=jnp.float32,
    )
    assert len(pp.stages) == 2
    # stage 0's weights live only on its 4 sub-mesh devices, sharded
    leaf = jax.tree.leaves(pp.stages[0].blocks)[0]
    assert set(leaf.devices()) == set(jax.devices()[:4])

    got1 = pp.forward(tokens, fresh=True)
    got2 = pp.forward(nxt)
    # row-parallel layers are re-encoded BLOCKED under TP (per-shard
    # scale groups) — same tolerance discipline as tests/test_tp.py
    np.testing.assert_allclose(
        np.asarray(ref1), np.asarray(got1), atol=0.03
    )
    np.testing.assert_allclose(
        np.asarray(ref2), np.asarray(got2), atol=0.03
    )
    assert np.argmax(np.asarray(ref2)[0, -1]) == np.argmax(
        np.asarray(got2)[0, -1]
    )


def test_tp_pp_pipelined_microbatches_and_bubble(tmp_path):
    """1F microbatch schedule over TP stages: per-microbatch logits
    match the plain stage-sequential forward, the schedule executes
    exactly n*m stage-steps over n+m-1 ticks (bubble fraction
    (n-1)/(n+m-1)), and every stage is busy in the steady state."""
    from vptq_tpu.parallel.pipeline import TPPipelineRunner

    cfg = tiny_model_config(
        num_hidden_layers=4, tie_word_embeddings=False,
    )
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    model = load_model(
        str(root), dtype=jnp.float32, runtime_format="int8"
    )

    m = 3  # microbatches
    chunks = [
        jnp.asarray([[2 + i, 9, 4]], jnp.int32) for i in range(m)
    ]
    pp = TPPipelineRunner(
        model, jax.devices()[:8], tp=2, max_seq=16, batch=m,
        dtype=jnp.float32,
    )
    n = len(pp.stages)
    assert n == 4

    calls = []
    orig = pp._run_stage

    def spy(s, x, cache, first, last, fresh):
        calls.append(s)
        return orig(s, x, cache, first, last, fresh)

    pp._run_stage = spy
    outs = pp.forward_pipelined(chunks, fresh=True)

    # schedule: n*m stage-steps; bubble = (n-1)/(n+m-1) of the
    # tick-grid is idle
    assert len(calls) == n * m
    ticks = n + m - 1
    bubble = 1 - (n * m) / (n * ticks)
    assert abs(bubble - (n - 1) / ticks) < 1e-9

    # exactness per microbatch vs the stage-sequential path
    pp2 = TPPipelineRunner(
        model, jax.devices()[:8], tp=2, max_seq=16, batch=1,
        dtype=jnp.float32,
    )
    for i in range(m):
        want = pp2.forward(chunks[i], fresh=True)
        np.testing.assert_allclose(
            np.asarray(outs[i]), np.asarray(want), atol=1e-4
        )
        # reset pp2's caches for the next independent microbatch
        pp2 = TPPipelineRunner(
            model, jax.devices()[:8], tp=2, max_seq=16, batch=1,
            dtype=jnp.float32,
        )


def test_tp_pp_single_stage_tied_embeddings(tmp_path):
    """Tied-embedding models work in the supported single-stage TP
    case (review r3 finding: lm_head=None crashed construction)."""
    from vptq_tpu.parallel.pipeline import TPPipelineRunner

    cfg = tiny_model_config(num_hidden_layers=2)  # tied embeddings
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    model = load_model(
        str(root), dtype=jnp.float32, runtime_format="int8"
    )
    pp = TPPipelineRunner(
        model, jax.devices()[:2], tp=2, max_seq=16,
        dtype=jnp.float32,
    )
    tokens = jnp.asarray([[1, 7, 42]], jnp.int32)
    cache = init_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(model, tokens, cache, dtype=jnp.float32)
    got = pp.forward(tokens, fresh=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=0.03
    )
