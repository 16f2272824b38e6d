"""Prefix KV cache: correctness (same outputs) and reuse (hits)."""

import numpy as np

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.serving import Generator, PrefixCache, Scheduler
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def _model(tmp_path):
    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=23,
    )
    return load_model(
        str(tmp_path), dtype=jnp.float32, runtime_format="bf16"
    )


def test_prefix_cache_block_chaining():
    pc = PrefixCache(block_size=4)
    toks = list(range(10))
    assert pc.match(toks) == 0  # cold
    # fake K/V for 10 tokens: (layers=2, 1, 10, kv=2, hd=8)
    k = jnp.arange(2 * 10 * 2 * 8, dtype=jnp.float32).reshape(
        2, 1, 10, 2, 8
    )
    pc.insert(toks, k, k + 1.0, plen=10)
    assert pc.num_blocks == 2  # two full blocks; tail not cached
    assert pc.match(toks) == 8
    # different first block => no reuse of the second (chained keys)
    other = [99] + toks[1:]
    assert pc.match(other) == 0
    got_k, got_v = pc.gather(toks, 8)
    np.testing.assert_array_equal(
        np.asarray(got_k), np.asarray(k[:, :, :8])
    )
    np.testing.assert_array_equal(
        np.asarray(got_v), np.asarray(k[:, :, :8] + 1.0)
    )


def test_prefix_cache_lru_eviction():
    pc = PrefixCache(block_size=4, capacity_bytes=2048)
    k = jnp.zeros((2, 1, 4, 2, 8), jnp.float32)  # one block
    # each insert is 2 * 512 bytes = 1 KiB; capacity = 2 KiB => 2 blocks
    pc.insert([1, 2, 3, 4], k, k)
    pc.insert([5, 6, 7, 8], k, k)
    assert pc.num_blocks == 2
    pc.insert([9, 10, 11, 12], k, k)
    assert pc.num_blocks == 2  # oldest evicted
    assert pc.match([1, 2, 3, 4, 0]) == 0
    assert pc.match([9, 10, 11, 12, 0]) == 4


def test_generator_prefix_cache_exact(tmp_path):
    model = _model(tmp_path)
    system = list(np.arange(1, 20) % 50)  # 19-token shared prefix

    gen_plain = Generator(
        model, max_seq=64, dtype=jnp.float32, prompt_buckets=(16, 32)
    )
    pc = PrefixCache(block_size=8)
    gen_pc = Generator(
        model, max_seq=64, dtype=jnp.float32, prompt_buckets=(16, 32),
        prefix_cache=pc,
    )

    p1 = system + [30, 31]
    p2 = system + [40, 41, 42]

    want1 = gen_plain.generate(p1, max_new_tokens=8)
    want2 = gen_plain.generate(p2, max_new_tokens=8)

    got1 = gen_pc.generate(p1, max_new_tokens=8)  # cold
    assert pc.num_blocks > 0
    got2 = gen_pc.generate(p2, max_new_tokens=8)  # shared-prefix hit
    assert pc.hits >= 1
    assert got1 == want1
    assert got2 == want2


def test_scheduler_prefix_cache_exact(tmp_path):
    model = _model(tmp_path)
    system = list(np.arange(1, 18) % 50)
    prompts = [system + [30], system + [40, 41], [7, 8, 9]]

    plain = Scheduler(
        model, max_batch=2, max_seq=64, dtype=jnp.float32,
        prompt_buckets=(16, 32),
    )
    for p in prompts:
        plain.submit(p, max_new_tokens=6)
    want = plain.run()

    pc = PrefixCache(block_size=8)
    sched = Scheduler(
        model, max_batch=2, max_seq=64, dtype=jnp.float32,
        prompt_buckets=(16, 32), prefix_cache=pc,
    )
    for p in prompts:
        sched.submit(p, max_new_tokens=6)
    got = sched.run()

    assert got == want
    assert pc.hits >= 1
