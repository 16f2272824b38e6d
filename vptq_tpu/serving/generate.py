"""Generation loop: prefill + KV-cached decode.

The reference inherits HF ``generate()`` (reference:
vptq/app_utils.py:55-60); here the loop is our own JAX decode: one
jitted prefill over the prompt, then a jitted single-token step reusing
the functional KV cache. Shapes are static (prompt padded to a bucket,
fixed max sequence), so everything compiles once.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vptq_tpu.models.llama import Model, forward, init_cache

__all__ = ["Generator"]


def _pad_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Generator:
    """Stateless-model, stateful-cache generation driver."""

    def __init__(
        self,
        model: Model,
        max_seq: int = 2048,
        dtype=jnp.bfloat16,
        prompt_buckets: Sequence[int] = (128, 512, 2048),
    ):
        self.model = model
        self.max_seq = max_seq
        self.dtype = dtype
        self.prompt_buckets = [b for b in prompt_buckets if b <= max_seq]
        if not self.prompt_buckets:
            self.prompt_buckets = [max_seq]

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _forward(model, tokens, cache):
            return forward(model, tokens, cache, dtype=self.dtype)

        self._forward = _forward

    def generate(
        self,
        prompt_tokens: Sequence[int] | np.ndarray,
        max_new_tokens: int = 128,
        eos_token_id: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
        stream_callback=None,
    ) -> List[int]:
        """Generate greedily (temperature=0) or with sampling.

        Single-sequence API; batched serving lives in the scheduler.
        """
        prompt = np.asarray(prompt_tokens, dtype=np.int32)
        if prompt.ndim != 1:
            raise ValueError("prompt must be 1-D")
        plen = len(prompt)
        bucket = _pad_bucket(plen, self.prompt_buckets)

        cache = init_cache(self.model.cfg, 1, self.max_seq, self.dtype)
        # right-pad the prompt into the bucket; the pad tokens' cache
        # entries are overwritten because the cache length is rewound to
        # the true prompt length after prefill.
        padded = np.zeros(bucket, dtype=np.int32)
        padded[:plen] = prompt
        logits, cache = self._forward(
            self.model, jnp.asarray(padded)[None, :], cache
        )
        # rewind cache length to the true prompt length
        cache = cache.replace(length=jnp.asarray(plen, jnp.int32))

        key = jax.random.PRNGKey(seed)
        last_logits = logits[0, plen - 1]
        out: List[int] = []
        for _ in range(max_new_tokens):
            if temperature > 0.0:
                key, sub = jax.random.split(key)
                next_id = int(
                    jax.random.categorical(sub, last_logits / temperature)
                )
            else:
                next_id = int(jnp.argmax(last_logits))
            out.append(next_id)
            if stream_callback is not None:
                stream_callback(next_id)
            if eos_token_id is not None and next_id == eos_token_id:
                break
            if int(cache.length) + 1 >= self.max_seq:
                break
            logits, cache = self._forward(
                self.model,
                jnp.full((1, 1), next_id, dtype=jnp.int32),
                cache,
            )
            last_logits = logits[0, 0]
        return out
