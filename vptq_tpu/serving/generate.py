"""Generation: jitted prefill + fully on-device decode loop.

The reference inherits HF ``generate()`` (reference:
vptq/app_utils.py:55-60), dispatching one kernel launch per linear per
token from the host. On this TPU environment a single host↔device sync
costs ~26 ms, so the decode loop runs entirely on device: one
``lax.scan`` over all new tokens inside one jit — the host only sees
the final token block.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vptq_tpu.models.llama import KVCache, Model, forward, init_cache

__all__ = ["Generator", "decode_loop", "decode_loop_tp"]


def sample_next(logits, key, temperature):
    """Greedy/temperature sampling for one step.

    ``logits`` (B, V); ``temperature`` scalar or (B,) — 0 selects
    greedy per sequence. Returns ((B,) int32 tokens, new key).
    """
    key, sub = jax.random.split(key)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperature, 1e-6)
    if temp.ndim:
        temp = temp[:, None]
    sampled = jax.random.categorical(
        sub, logits / temp, axis=-1
    ).astype(jnp.int32)
    nxt = jnp.where(temperature > 0, sampled, greedy)
    return nxt, key


@functools.partial(
    jax.jit, static_argnames=("steps", "dtype"), donate_argnums=(2,)
)
def decode_loop(
    model: Model,
    first_token: jnp.ndarray,  # (B,) int32
    cache: KVCache,
    key: jnp.ndarray,
    temperature: jnp.ndarray,  # () f32; 0 => greedy
    *,
    steps: int,
    dtype=jnp.bfloat16,
):
    """Generate ``steps`` tokens on device. Returns ((steps, B), cache)."""

    def step(carry, _):
        tok, cache, key = carry
        logits, cache = forward(model, tok[:, None], cache, dtype=dtype)
        nxt, key = sample_next(logits[:, 0], key, temperature)
        return (nxt, cache, key), nxt

    (last, cache, _), toks = jax.lax.scan(
        step, (first_token, cache, key), None, length=steps
    )
    return toks, cache


@functools.partial(
    jax.jit,
    static_argnames=("specs", "mesh", "axis", "steps", "dtype"),
    donate_argnums=(2,),
)
def decode_loop_tp(
    model: Model,
    first_token: jnp.ndarray,  # (B,) int32
    cache: KVCache,
    key: jnp.ndarray,
    temperature: jnp.ndarray,
    *,
    specs,
    mesh,
    axis: str = "model",
    steps: int,
    dtype=jnp.bfloat16,
):
    """``decode_loop`` under shard_map tensor parallelism: the whole
    scan runs in manual-mesh mode so every kernel call stays local and
    the per-step collectives (psums + logits all-gather) ride ICI
    inside the loop. Sampling sees replicated logits and a replicated
    key — identical tokens on every device."""
    from jax.sharding import PartitionSpec as P

    from vptq_tpu.parallel.tp import batch_axis, cache_tp_specs

    size = mesh.shape[axis]
    b_ax = batch_axis(mesh, int(first_token.shape[0]))
    cache_specs = cache_tp_specs(cache, axis, b_ax)

    def local(model, first_token, cache, key, temperature):
        if b_ax is not None:
            # each data shard samples its own batch rows — fold the
            # shard index in so shards don't share gumbel noise
            key = jax.random.fold_in(
                key, jax.lax.axis_index(b_ax)
            )

        def step(carry, _):
            tok, cache, key = carry
            logits, cache = forward(
                model, tok[:, None], cache, dtype=dtype,
                tp=(axis, size),
            )
            nxt, key = sample_next(logits[:, 0], key, temperature)
            return (nxt, cache, key), nxt

        (last, cache2, _), toks = jax.lax.scan(
            step, (first_token, cache, key), None, length=steps
        )
        return toks, cache2

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(b_ax), cache_specs, P(), P()),
        out_specs=(P(None, b_ax), cache_specs),
        check_vma=False,
    )(model, first_token, cache, key, temperature)


def _pad_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Generator:
    """Single-sequence generation driver (batched serving lives in the
    scheduler)."""

    def __init__(
        self,
        model: Model,
        max_seq: int = 2048,
        dtype=jnp.bfloat16,
        prompt_buckets: Sequence[int] = (128, 512, 2048),
        prefix_cache=None,  # serving.prefix_cache.PrefixCache
        mesh=None,  # shard_map TP: model from load_model(parallel="tp")
    ):
        self.model = model
        self.max_seq = max_seq
        self.dtype = dtype
        self.prefix_cache = prefix_cache
        self.mesh = mesh
        self.prompt_buckets = [b for b in prompt_buckets if b <= max_seq]
        if not self.prompt_buckets:
            self.prompt_buckets = [max_seq]

        if mesh is not None:
            from vptq_tpu.parallel.tp import (
                forward_tp,
                prefill_cp,
                tp_specs,
            )

            self._specs = tp_specs(model)
            cp_size = int(mesh.shape.get("data", 1))

            def _prefill(model, tokens, cache, fresh=False):
                with mesh:
                    if (
                        fresh
                        and cp_size > 1
                        and tokens.shape[1] % cp_size == 0
                    ):
                        # context-parallel fresh prefill: sequence
                        # chunks over the data axis, ring attention
                        return prefill_cp(
                            model, tokens, cache, self._specs,
                            mesh, dtype=self.dtype,
                        )
                    return forward_tp(
                        model, tokens, cache, self._specs, mesh,
                        dtype=self.dtype, fresh_prefill=fresh,
                    )

            self._prefill = _prefill
        else:
            self._specs = None

            @functools.partial(
                jax.jit, donate_argnums=(2,), static_argnames=("fresh",)
            )
            def _prefill(model, tokens, cache, fresh=False):
                return forward(
                    model, tokens, cache, dtype=self.dtype,
                    fresh_prefill=fresh,
                )

            self._prefill = _prefill

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _write_prefix(cache, k, v, n):
            # k/v arrive stacked (layers, 1, n, kv, hd) from the
            # prefix store; the cache is per-layer tuples
            return KVCache(
                k=tuple(
                    jax.lax.dynamic_update_slice(
                        buf, k[i].astype(buf.dtype), (0, 0, 0, 0)
                    )
                    for i, buf in enumerate(cache.k)
                ),
                v=tuple(
                    jax.lax.dynamic_update_slice(
                        buf, v[i].astype(buf.dtype), (0, 0, 0, 0)
                    )
                    for i, buf in enumerate(cache.v)
                ),
                lengths=jnp.full_like(cache.lengths, n),
            )

        self._write_prefix = _write_prefix

    def generate(
        self,
        prompt_tokens: Sequence[int] | np.ndarray,
        max_new_tokens: int = 128,
        eos_token_id: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
        stream_callback=None,
        chunk_size: int = 32,
    ) -> List[int]:
        """Generate tokens; the device loop runs in ``chunk_size``-token
        scans with host syncs only between chunks (streaming + EOS)."""
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        if prompt.ndim != 1:
            raise ValueError("prompt must be 1-D")
        if prompt.size == 0:
            raise ValueError("prompt must contain at least one token")
        plen = len(prompt)
        if plen >= self.max_seq:
            raise ValueError(
                f"prompt length {plen} >= max_seq {self.max_seq}"
            )

        cache = init_cache(self.model.cfg, 1, self.max_seq, self.dtype)
        if self.mesh is not None:
            from vptq_tpu.parallel.tp import shard_cache_tp

            cache = shard_cache_tp(cache, self.mesh)
        # Prefill in bucket-sized chunks: each chunk is right-padded
        # into its bucket; pad positions are never attended to because
        # the cache length is rewound to the true length after each
        # chunk (the next chunk/token overwrites the padded K/V rows).
        max_bucket = self.prompt_buckets[-1]
        logits = None
        done = 0
        last_len = 0
        if self.prefix_cache is not None:
            done = self.prefix_cache.match(prompt)
            if done:
                k, v = self.prefix_cache.gather(prompt, done)
                cache = self._write_prefix(
                    cache, k, v, jnp.asarray(done, jnp.int32)
                )
        while done < plen:
            chunk = prompt[done: done + max_bucket]
            last_len = len(chunk)
            bucket = _pad_bucket(last_len, self.prompt_buckets)
            padded = np.zeros(bucket, dtype=np.int32)
            padded[:last_len] = chunk
            logits, cache = self._prefill(
                self.model, jnp.asarray(padded)[None, :], cache,
                fresh=(done == 0),
            )
            done += last_len
            cache = cache.replace(
                lengths=jnp.full((1,), done, jnp.int32)
            )
        last_logits = logits[:, last_len - 1]
        if self.prefix_cache is not None:
            self.prefix_cache.insert(
                prompt,
                jnp.stack([b[:, :plen] for b in cache.k]),
                jnp.stack([b[:, :plen] for b in cache.v]),
                plen,
            )

        first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        if temperature > 0:
            key0 = jax.random.PRNGKey(seed)
            first = jax.random.categorical(
                key0, last_logits / temperature, axis=-1
            ).astype(jnp.int32)

        out_tokens = [int(first[0])]
        if stream_callback is not None:
            stream_callback(out_tokens[0])
        if eos_token_id is not None and out_tokens[0] == eos_token_id:
            return out_tokens

        budget = min(max_new_tokens - 1, self.max_seq - plen - 1)
        done = 0
        chunk_idx = 0
        while done < budget:
            steps = min(chunk_size, budget - done)
            if self.mesh is not None:
                with self.mesh:
                    toks, cache = decode_loop_tp(
                        self.model,
                        first,
                        cache,
                        jax.random.PRNGKey(seed + 1 + chunk_idx),
                        jnp.asarray(temperature, jnp.float32),
                        specs=self._specs,
                        mesh=self.mesh,
                        steps=steps,
                        dtype=self.dtype,
                    )
            else:
                toks, cache = decode_loop(
                    self.model,
                    first,
                    cache,
                    jax.random.PRNGKey(seed + 1 + chunk_idx),
                    jnp.asarray(temperature, jnp.float32),
                    steps=steps,
                    dtype=self.dtype,
                )
            arr = np.asarray(toks)[:, 0].tolist()
            stop = None
            if eos_token_id is not None and eos_token_id in arr:
                stop = arr.index(eos_token_id)
                arr = arr[: stop + 1]
            out_tokens.extend(arr)
            if stream_callback is not None:
                for t in arr:
                    stream_callback(t)
            if stop is not None:
                break
            first = toks[-1]
            done += steps
            chunk_idx += 1
        return out_tokens
