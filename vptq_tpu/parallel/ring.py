"""Ring (context-parallel) attention over a mesh axis.

Long-context prefill parallelism (SURVEY §5.7): the prompt's token
chunks live one per device on the ring axis; each device keeps its
query chunk resident while the K/V chunks rotate around the ring with
``lax.ppermute`` — n-1 hops of chunk-sized KV on ICI instead of an
S×S attention on one device. Causality makes the schedule static:
the diagonal (own) chunk is step 0 with an intra-chunk causal mask;
ring step s's chunk is fully visible iff ``s <= axis_index`` (devices
early in the ring simply discard late arrivals — the classic
untwisted ring; fine at the prefill sizes this serves).

Partial attention states combine with the flash-attention online
softmax: each chunk yields a normalized output plus its row (max,
sumexp); two states merge exactly, so the ring result is bit-close to
the dense causal softmax over the full sequence.

The reference has nothing comparable (its long-context story is a
single GPU's HBM); this is a from-scratch TPU design.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ring_attention", "chunk_attention"]

_NEG = jnp.float32(-1e30)


def chunk_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, KV, D)
    v: jnp.ndarray,  # (B, Sk, KV, Dv)
    causal: bool,
    sm_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One q-chunk × kv-chunk attention block with flash residuals.

    Returns ``(o, l, m)``: the softmax-normalized output for this kv
    range plus each query row's sumexp ``l`` and max ``m`` — the
    state needed to merge blocks exactly (flash-attention algebra).
    GQA: q heads H must be a multiple of kv heads KV.
    """
    b, sq, nh, d = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    qg = q.reshape(b, sq, nkv, group, d)
    scores = jnp.einsum(
        "bqkgd,btkd->bkgqt",
        qg.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * jnp.float32(sm_scale)  # (B, KV, G, Sq, Sk)
    if causal:
        mask = (
            jnp.arange(k.shape[1])[None, :]
            <= jnp.arange(sq)[:, None]
        )  # (Sq, Sk)
        scores = jnp.where(mask[None, None, None], scores, _NEG)
    m = jnp.max(scores, axis=-1)  # (B, KV, G, Sq)
    p = jnp.exp(scores - m[..., None])
    li = jnp.sum(p, axis=-1)  # (B, KV, G, Sq)
    o = jnp.einsum(
        "bkgqt,btkd->bkgqd", p, v.astype(jnp.float32)
    ) / jnp.maximum(li, 1e-38)[..., None]
    # back to (B, Sq, H, Dv) / (B, Sq, H)
    o = o.transpose(0, 3, 1, 2, 4).reshape(b, sq, nh, v.shape[3])
    li = li.transpose(0, 3, 1, 2).reshape(b, sq, nh)
    m = m.transpose(0, 3, 1, 2).reshape(b, sq, nh)
    return o, li, m


def _merge(o_a, l_a, m_a, o_b, l_b, m_b):
    """Exactly combine two normalized partial-softmax states."""
    m_new = jnp.maximum(m_a, m_b)
    wa = jnp.exp(m_a - m_new) * l_a
    wb = jnp.exp(m_b - m_new) * l_b
    l_new = wa + wb
    o_new = (
        o_a * wa[..., None] + o_b * wb[..., None]
    ) / jnp.maximum(l_new, 1e-38)[..., None]
    return o_new, l_new, m_new


def ring_attention(
    q: jnp.ndarray,  # (B, Sc, H, D) — LOCAL sequence chunk
    k: jnp.ndarray,  # (B, Sc, KV, D)
    v: jnp.ndarray,  # (B, Sc, KV, Dv)
    axis: str,
    n_shards: int,
    sm_scale: float,
) -> jnp.ndarray:
    """Causal self-attention with the sequence sharded over ``axis``.

    Must run inside a ``shard_map``; device d owns global positions
    ``[d*Sc, (d+1)*Sc)``. Static n-step schedule: step 0 is the local
    (diagonal) chunk with a causal mask; each further step ppermutes
    the K/V chunks one hop and the contribution is masked out on
    devices whose chunk index is below the sender's.
    """
    my = lax.axis_index(axis)
    o, l, m = chunk_attention(q, k, v, True, sm_scale)
    kv = (k, v)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    for s in range(1, n_shards):
        kv = lax.ppermute(kv, axis, perm)
        # after s hops device d holds chunk (d - s) mod n — fully
        # visible (earlier in the sequence) iff s <= d
        oi, li, mi = chunk_attention(q, *kv, False, sm_scale)
        valid = (s <= my)
        li = jnp.where(valid, li, 0.0)
        mi = jnp.where(valid, mi, _NEG)
        oi = jnp.where(valid, oi, 0.0)
        o, l, m = _merge(o, l, m, oi, li, mi)
    return o.astype(q.dtype)
