"""Pipeline-style layer placement (reference parity).

The reference's ONLY multi-device mechanism is accelerate's
layer-wise ``device_map``: decoder blocks live on different GPUs and
activations hop devices between layers (reference
model_base.py:183-194 — placement, not pipelined execution). This is
the TPU equivalent: each contiguous group of decoder blocks is one
STAGE compiled for one device; activations move stage-to-stage with
an async ``device_put`` (ICI), exactly one activations-sized
transfer per boundary per step and no collectives at all. (Stages
are single devices; combine with TP by using the shard_map path
instead when latency matters — PP's niche is capacity over slow
links.)

When to use which parallelism:

- **TP (parallel/tp.py)** — the recommended scaling axis: every chip
  works on every token, collectives are activation-sized psums. Use
  for latency.
- **PP (this module)** — memory capacity with MINIMAL communication,
  at the cost of stage idling (no microbatch interleaving — for
  batch-1 decode the bubble dominates, so this is a capacity/DCN
  tool: the niche accelerate's device_map fills for the reference).

Each device holds only its layers' weights and KV buffers.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from vptq_tpu.models.llama import (
    KVCache,
    MlaAttention,
    Model,
    _attention,
    _mla_attention,
    _mlp,
    init_cache,
    rms_norm,
    rope_cos_sin,
    rope_frequencies,
)
from vptq_tpu.models.llama import Block  # noqa: F401  (re-export)
from flax import struct

__all__ = ["PipelineRunner", "pp_stage_of"]


def pp_stage_of(layer_idx: int, n_layers: int, n_stages: int) -> int:
    """Contiguous block→stage assignment (balanced remainder-first)."""
    base, rem = divmod(n_layers, n_stages)
    boundary = rem * (base + 1)
    if layer_idx < boundary:
        return layer_idx // (base + 1)
    return rem + (layer_idx - boundary) // base


@struct.dataclass
class _Stage:
    """One pipeline stage's parameters (a Model slice)."""

    blocks: Tuple
    embed_tokens: jnp.ndarray = None  # first stage only
    norm: jnp.ndarray = None  # last stage only
    lm_head: object = None  # last stage only
    cfg: object = struct.field(pytree_node=False, default=None)


@functools.partial(
    jax.jit, static_argnames=("first", "last", "dtype", "fresh")
)
def _stage_step(
    stage: _Stage,
    x,  # (B, S) int32 tokens on stage 0, else (B, S, H) hidden
    cache: KVCache,  # this stage's layers only
    dtype=jnp.bfloat16,
    first: bool = False,
    last: bool = False,
    fresh: bool = False,
):
    cfg = stage.cfg
    if first:
        x = stage.embed_tokens[x].astype(dtype)
    batch, seq = x.shape[0], x.shape[1]
    positions = (
        cache.lengths[:, None]
        + jnp.arange(seq)[None, :].astype(jnp.int32)
    )
    inv_freq, rope_scale = rope_frequencies(cfg)
    cos, sin = rope_cos_sin(positions, inv_freq, rope_scale)

    for j, block in enumerate(stage.blocks):
        h = rms_norm(x, block.input_layernorm, cfg.rms_norm_eps)
        if isinstance(block.attn, MlaAttention):
            attn_out, cache = _mla_attention(
                j, block.attn, h, cos, sin, cache, cfg
            )
        else:
            attn_out, cache = _attention(
                j, block.attn, h, cos, sin, cache, cfg,
                fresh_prefill=fresh,
            )
        x = x + attn_out
        h = rms_norm(
            x, block.post_attention_layernorm, cfg.rms_norm_eps
        )
        x = x + _mlp(block.mlp, h)

    cache = KVCache(
        k=cache.k, v=cache.v, lengths=cache.lengths + seq
    )
    if not last:
        return x, cache
    x = rms_norm(x, stage.norm, cfg.rms_norm_eps)
    if stage.lm_head is not None:
        logits = stage.lm_head(x)
    else:
        logits = jnp.dot(
            x,
            stage.embed_tokens.T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    return logits.astype(jnp.float32), cache


class PipelineRunner:
    """Layer-wise pipeline over explicit devices.

    ``forward(tokens)`` matches ``models.llama.forward`` numerically;
    stage hops are async ``device_put`` on ICI.
    """

    def __init__(
        self,
        model: Model,
        devices: Sequence,
        max_seq: int = 2048,
        batch: int = 1,
        dtype=jnp.bfloat16,
    ):
        L = len(model.blocks)
        n = len(devices)
        if n < 1 or L < n:
            raise ValueError(
                f"{L} layers cannot spread over {n} devices"
            )
        if model.lm_head is None and n > 1:
            # tied embeddings are needed on both the first and last
            # stage; keep a copy on the last one
            tied_embed = jax.device_put(
                model.embed_tokens, devices[-1]
            )
        else:
            tied_embed = None
        self.devices = list(devices)
        self.dtype = dtype
        self.cfg = model.cfg
        self.stages: List[_Stage] = []
        self.caches: List[KVCache] = []
        put = lambda tree, d: jax.tree.map(  # noqa: E731
            lambda a: jax.device_put(a, d), tree
        )
        for s in range(n):
            blocks = tuple(
                model.blocks[i]
                for i in range(L)
                if pp_stage_of(i, L, n) == s
            )
            stage = _Stage(
                blocks=blocks,
                embed_tokens=(
                    model.embed_tokens
                    if s == 0
                    else (tied_embed if s == n - 1 else None)
                ),
                norm=model.norm if s == n - 1 else None,
                lm_head=model.lm_head if s == n - 1 else None,
                cfg=model.cfg,
            )
            self.stages.append(put(stage, devices[s]))
            cache_cfg_layers = len(blocks)
            full = init_cache(model.cfg, batch, max_seq, dtype)
            self.caches.append(
                put(
                    KVCache(
                        k=full.k[:cache_cfg_layers],
                        v=full.v[:cache_cfg_layers],
                        lengths=full.lengths,
                    ),
                    devices[s],
                )
            )

    def forward(self, tokens: jnp.ndarray, fresh: bool = False):
        """One decode/prefill step across all stages; returns logits
        (the per-stage KV caches advance in place)."""
        n = len(self.stages)
        x = jax.device_put(tokens, self.devices[0])
        for s in range(n):
            out, self.caches[s] = _stage_step(
                self.stages[s], x, self.caches[s],
                dtype=self.dtype,
                first=(s == 0), last=(s == n - 1), fresh=fresh,
            )
            if s < n - 1:
                x = jax.device_put(out, self.devices[s + 1])
            else:
                return out

    def forward_pipelined(
        self,
        token_chunks: Sequence[jnp.ndarray],
        fresh: bool = False,
    ):
        """Microbatch-pipelined step: the classic 1F schedule.

        ``token_chunks`` are independent batch microbatches (each
        (B_i, S)); at tick t stage s works on microbatch t-s, so all
        stages are busy once the pipe fills. JAX's async dispatch
        provides the overlap — every _stage_step call enqueues on its
        own device and only the final logits synchronize. Bubble
        fraction = (n_stages-1)/(n_stages+n_micro-1).

        Each microbatch keeps its OWN per-stage KV cache
        (self.mb_caches[stage][i], lazily split off the stage cache
        batch rows on first use) — no cross-microbatch copies.
        Returns the per-microbatch logits list.
        """
        n = len(self.stages)
        m = len(token_chunks)
        if not hasattr(self, "mb_caches") or len(
            self.mb_caches[0]
        ) != m:
            # split each stage cache into per-microbatch row groups
            offs = [0]
            for t in token_chunks:
                offs.append(offs[-1] + int(t.shape[0]))
            if offs[-1] > int(self.caches[0].lengths.shape[0]):
                raise ValueError(
                    f"microbatch rows {offs[-1]} exceed cache batch "
                    f"{int(self.caches[0].lengths.shape[0])}"
                )
            self.mb_caches = [
                [
                    jax.tree.map(
                        lambda a, b0=offs[i], b1=offs[i + 1]: a[b0:b1],
                        self.caches[s],
                    )
                    for i in range(m)
                ]
                for s in range(n)
            ]
        acts = [None] * m
        outs = [None] * m
        for tick in range(n + m - 1):
            for s in range(min(tick + 1, n)):
                i = tick - s  # microbatch index at stage s
                if not (0 <= i < m):
                    continue
                if s == 0:
                    x = jax.device_put(
                        token_chunks[i], self.devices[0]
                    )
                else:
                    x = jax.device_put(acts[i], self.devices[s])
                out, self.mb_caches[s][i] = _stage_step(
                    self.stages[s], x, self.mb_caches[s][i],
                    dtype=self.dtype,
                    first=(s == 0), last=(s == n - 1),
                    fresh=fresh,
                )
                if s == n - 1:
                    outs[i] = out
                else:
                    acts[i] = out
        return outs
