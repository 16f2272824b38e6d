"""Continuous batching: batched slot decode must reproduce
single-sequence generation exactly (greedy, fp32)."""

import numpy as np

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.serving.generate import Generator
from vptq_tpu.serving.scheduler import Scheduler
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
        seed=41,
    )
    return load_model(str(tmp_path), dtype=jnp.float32,
                      runtime_format="bf16")


def test_scheduler_matches_single_sequence(tmp_path):
    model = _model(tmp_path)
    gen = Generator(model, max_seq=64, dtype=jnp.float32,
                    prompt_buckets=(16,))

    prompts = [[1, 2, 3], [9, 8, 7, 6, 5], [42]]
    singles = [
        gen.generate(p, max_new_tokens=10) for p in prompts
    ]

    sched = Scheduler(
        model, max_batch=2, max_seq=64, dtype=jnp.float32, chunk=4,
        prompt_buckets=(16,),
    )
    ids = [
        sched.submit(p, max_new_tokens=10) for p in prompts
    ]
    results = sched.run()

    for rid, single in zip(ids, singles):
        assert results[rid] == single, (rid, results[rid], single)


def test_scheduler_streaming_and_eos(tmp_path):
    model = _model(tmp_path)
    sched = Scheduler(
        model, max_batch=2, max_seq=64, dtype=jnp.float32, chunk=4,
        prompt_buckets=(16,),
    )
    gen = Generator(model, max_seq=64, dtype=jnp.float32,
                    prompt_buckets=(16,))
    # pick the 3rd generated token as a fake EOS to exercise truncation
    ref = gen.generate([5, 6], max_new_tokens=10)
    eos = ref[2]

    streamed = []
    rid = sched.submit(
        [5, 6], max_new_tokens=10, eos_token_id=eos,
        stream_callback=lambda r, t: streamed.append(t),
    )
    out = sched.run()[rid]
    assert out == ref[: ref.index(eos) + 1]
    assert streamed == out


def test_scheduler_long_prompt(tmp_path):
    model = _model(tmp_path)
    gen = Generator(model, max_seq=64, dtype=jnp.float32,
                    prompt_buckets=(16,))
    prompt = list(range(1, 38))  # longer than the 16-token bucket
    ref = gen.generate(prompt, max_new_tokens=6)

    sched = Scheduler(model, max_batch=2, max_seq=64,
                      dtype=jnp.float32, chunk=4, prompt_buckets=(16,))
    rid = sched.submit(prompt, max_new_tokens=6)
    assert sched.run()[rid] == ref
