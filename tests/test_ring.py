"""Ring (context-parallel) attention + CP prefill (parallel/ring.py,
parallel/tp.py prefill_cp)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.models.loader import load_model
from vptq_tpu.parallel.ring import chunk_attention, ring_attention
from vptq_tpu.parallel.sharding import make_mesh
from vptq_tpu.parallel.tp import (
    forward_tp,
    prefill_cp,
    shard_cache_tp,
    tp_place_model,
)
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def _ring_ref(q, k, v, scale):
    o, _, _ = chunk_attention(q, k, v, True, scale)
    return o


def _run_ring(q, k, v, n, scale):
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("x",))

    def local(q, k, v):
        return ring_attention(q, k, v, "x", n, scale)

    seq_spec = P(None, "x", None, None)
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(seq_spec, seq_spec, seq_spec),
            out_specs=seq_spec,
            check_vma=False,
        )
    )(q, k, v)


def test_ring_matches_dense_causal():
    rng = np.random.default_rng(3)
    b, s, h, d = 2, 32, 4, 16
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.float32)
    want = np.asarray(_ring_ref(q, k, v, d ** -0.5))
    got = np.asarray(_run_ring(q, k, v, 4, d ** -0.5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_gqa():
    rng = np.random.default_rng(5)
    b, s, h, kv, d = 1, 16, 8, 2, 8
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, s, kv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, s, kv, d)), jnp.float32)
    want = np.asarray(_ring_ref(q, k, v, d ** -0.5))
    got = np.asarray(_run_ring(q, k, v, 2, d ** -0.5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prefill_cp_matches_tp_prefill(tmp_path):
    """CP prefill (sequence ring over 'data' × TP over 'model') must
    reproduce the plain TP prefill: same logits, same cache, and
    decode continues identically from the CP-prefilled cache."""
    cfg = tiny_model_config(tie_word_embeddings=False)
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    mesh = make_mesh(
        data=2, model=2, devices=np.asarray(jax.devices()[:4])
    )
    model = load_model(str(root), runtime_format="int8")
    model_tp, specs = tp_place_model(model, mesh)

    tokens = jnp.asarray([[1, 7, 42, 9, 3, 5, 2, 8]], jnp.int32)
    with mesh:
        ref_logits, ref_cache = forward_tp(
            model_tp, tokens,
            shard_cache_tp(init_cache(cfg, 1, 32), mesh),
            specs, mesh, fresh_prefill=True,
        )
        cp_logits, cp_cache = prefill_cp(
            model_tp, tokens,
            shard_cache_tp(init_cache(cfg, 1, 32), mesh),
            specs, mesh,
        )
    a = np.asarray(ref_logits)
    b = np.asarray(cp_logits)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.03)
    assert int(cp_cache.lengths[0]) == tokens.shape[1]
    np.testing.assert_allclose(
        np.asarray(ref_cache.k[0])[:, : tokens.shape[1]],
        np.asarray(cp_cache.k[0])[:, : tokens.shape[1]],
        atol=0.02,
    )

    # decode one token from each cache: same next-token choice
    nxt = jnp.argmax(b[:, -1:], axis=-1).astype(jnp.int32)
    with mesh:
        l_ref, _ = forward_tp(
            model_tp, nxt, ref_cache, specs, mesh
        )
        l_cp, _ = forward_tp(model_tp, nxt, cp_cache, specs, mesh)
    assert np.argmax(np.asarray(l_ref)[0, -1]) == np.argmax(
        np.asarray(l_cp)[0, -1]
    )


def test_generator_cp_matches_tp(tmp_path):
    """Generator on a 2x2 mesh (data axis = context parallelism for
    prefill) reproduces the 1x2 pure-TP generator's greedy tokens —
    the model-axis shard encodings are identical, only the prefill
    parallelization differs."""
    from vptq_tpu.serving import Generator

    cfg = tiny_model_config(tie_word_embeddings=False)
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    prompt = [1, 7, 42, 9, 3, 5, 2, 8, 11, 4]

    mesh_tp = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    m1 = load_model(
        str(root), runtime_format="int8", mesh=mesh_tp, parallel="tp"
    )
    g1 = Generator(m1, max_seq=64, prompt_buckets=(16,), mesh=mesh_tp)
    want = g1.generate(prompt, max_new_tokens=10)

    mesh_cp = make_mesh(
        data=2, model=2, devices=np.asarray(jax.devices()[:4])
    )
    m2 = load_model(
        str(root), runtime_format="int8", mesh=mesh_cp, parallel="tp"
    )
    g2 = Generator(m2, max_seq=64, prompt_buckets=(16,), mesh=mesh_cp)
    got = g2.generate(prompt, max_new_tokens=10)
    assert got == want, (got, want)


def test_scheduler_cp_admission(tmp_path):
    """Scheduler on a 2x2 mesh: fresh admission prefills run
    context-parallel and outputs still match the TP generator."""
    from vptq_tpu.serving import Generator
    from vptq_tpu.serving.scheduler import Scheduler

    cfg = tiny_model_config(tie_word_embeddings=False)
    root = write_synthetic_checkpoint(
        str(tmp_path / "ckpt"), cfg, seed=5
    )
    mesh = make_mesh(
        data=2, model=2, devices=np.asarray(jax.devices()[:4])
    )
    model = load_model(
        str(root), runtime_format="int8", mesh=mesh, parallel="tp"
    )
    gen = Generator(model, max_seq=64, prompt_buckets=(16,),
                    mesh=mesh)
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6, 5, 4, 3]]
    singles = [gen.generate(p, max_new_tokens=6) for p in prompts]

    sched = Scheduler(model, max_batch=2, max_seq=64, chunk=4,
                      prompt_buckets=(16,), mesh=mesh)
    ids = [sched.submit(p, max_new_tokens=6) for p in prompts]
    out = sched.run()
    for rid, want in zip(ids, singles):
        assert out[rid] == want, (out[rid], want)
