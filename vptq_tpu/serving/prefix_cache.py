"""Prefix KV cache: reuse shared prompt prefixes across requests.

No reference counterpart (the reference re-runs HF ``generate`` per
request, reference vptq/app_utils.py:55-60); this is standard serving
infrastructure for system-prompt-heavy workloads: prompts that share a
prefix (chat system prompts, few-shot preambles, multi-turn replay)
skip recomputing attention K/V for the shared part.

Design (vLLM-style hash-chained blocks, on dense caches):
  * prompts are split into fixed ``block_size``-token blocks;
  * each FULL block is keyed by hash(parent_key, block_tokens) so a
    block is only reusable when its entire left context matches;
  * stored per block: the (layers, block_size, kv_heads, head_dim) K/V
    rows produced by prefill — device-resident, LRU-evicted against a
    byte budget;
  * on lookup, the longest chain of cached blocks is concatenated and
    written into the destination cache, and only the remainder of the
    prompt is prefilled.

The partial last block is never cached (its K/V depend on nothing
after it, but caching it would explode the key space).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PrefixCache"]


class PrefixCache:
    def __init__(
        self,
        block_size: int = 64,
        capacity_bytes: int = 1 << 30,
    ):
        self.block_size = block_size
        self.capacity_bytes = capacity_bytes
        # key -> (k_block, v_block) each (layers, block, kv, hd)
        self._store: "OrderedDict[Tuple, Tuple]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    # ----------------------------------------------------------- keys

    def _keys_for(self, tokens: np.ndarray) -> List[Tuple]:
        """Chained keys for each full block of ``tokens``."""
        keys: List[Tuple] = []
        parent: Tuple = ()
        n_full = len(tokens) // self.block_size
        for b in range(n_full):
            blk = tuple(
                int(t)
                for t in tokens[
                    b * self.block_size: (b + 1) * self.block_size
                ]
            )
            key = (parent, blk)
            keys.append(key)
            parent = key
        return keys

    # --------------------------------------------------------- lookup

    def match(self, tokens: Sequence[int]) -> int:
        """Longest cached prefix length (multiple of block_size)."""
        tokens = np.asarray(tokens)
        n = 0
        for key in self._keys_for(tokens):
            if key not in self._store:
                break
            self._store.move_to_end(key)  # LRU touch
            n += self.block_size
        # never return the whole prompt: the caller must still run at
        # least one token of prefill to get next-token logits
        if n >= len(tokens):
            n = max(0, (len(tokens) - 1) // self.block_size
                    * self.block_size)
        if n:
            self.hits += 1
        else:
            self.misses += 1
        return n

    def gather(self, tokens: Sequence[int], n: int):
        """(k, v) rows for the first ``n`` cached tokens:
        (layers, 1, n, kv_heads, head_dim) each."""
        if n == 0:
            return None
        tokens = np.asarray(tokens)
        ks, vs = [], []
        for key in self._keys_for(tokens[:n]):
            k_blk, v_blk = self._store[key]
            ks.append(k_blk)
            vs.append(v_blk)
        k = jnp.concatenate(ks, axis=1)[:, None]
        v = jnp.concatenate(vs, axis=1)[:, None]
        return k, v

    # ---------------------------------------------------------- store

    def insert(
        self,
        tokens: Sequence[int],
        k: jnp.ndarray,  # (layers, 1, >=plen, kv, hd)
        v: jnp.ndarray,
        plen: Optional[int] = None,
    ) -> None:
        """Cache the K/V rows of every full block of ``tokens``."""
        tokens = np.asarray(tokens)
        plen = plen if plen is not None else len(tokens)
        k = k[:, 0]
        v = v[:, 0]
        for b, key in enumerate(self._keys_for(tokens[:plen])):
            lo = b * self.block_size
            hi = lo + self.block_size
            if key in self._store:
                self._store.move_to_end(key)
                continue
            k_blk = jax.lax.slice_in_dim(k, lo, hi, axis=1)
            v_blk = jax.lax.slice_in_dim(v, lo, hi, axis=1)
            # K and V blocks can differ in size (MLA: qk_head_dim !=
            # v_head_dim) — account each separately
            nbytes = (
                k_blk.size * k_blk.dtype.itemsize
                + v_blk.size * v_blk.dtype.itemsize
            )
            while (
                self._bytes + nbytes > self.capacity_bytes
                and self._store
            ):
                _, (ek, ev) = self._store.popitem(last=False)
                self._bytes -= (
                    ek.size * ek.dtype.itemsize
                    + ev.size * ev.dtype.itemsize
                )
            if self._bytes + nbytes > self.capacity_bytes:
                return  # single block larger than the budget
            self._store[key] = (k_blk, v_blk)
            self._bytes += nbytes

    # ---------------------------------------------------------- stats

    @property
    def num_blocks(self) -> int:
        return len(self._store)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def clear(self) -> None:
        self._store.clear()
        self._bytes = 0
