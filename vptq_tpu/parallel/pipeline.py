"""Pipeline-style layer placement (reference parity).

The reference's ONLY multi-device mechanism is accelerate's
layer-wise ``device_map``: decoder blocks live on different GPUs and
activations hop devices between layers (reference
model_base.py:183-194 — placement, not pipelined execution). This is
the TPU equivalent: each contiguous group of decoder blocks is one
STAGE compiled for one device; activations move stage-to-stage with
an async ``device_put`` (ICI), exactly one activations-sized
transfer per boundary per step and no collectives at all.
:class:`TPPipelineRunner` composes the axes: each stage spans a
Megatron-TP sub-mesh (parallel/tp.py placement), so a DCN-connected
deployment runs TP inside each ICI group (latency axis) and PP
across groups (capacity axis).

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

__all__ = ["PipelineRunner", "TPPipelineRunner", "pp_stage_of"]


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

    def _to_stage(self, x, s: int):
        """Move activations/tokens onto stage ``s``'s device(s)."""
        return jax.device_put(x, self.devices[s])

    def _run_stage(self, s: int, x, cache, first, last, fresh):
        """One stage's forward (overridden by TPPipelineRunner)."""
        return _stage_step(
            self.stages[s], x, cache, dtype=self.dtype,
            first=first, last=last, fresh=fresh,
        )

    def forward(self, tokens: jnp.ndarray, fresh: bool = False):
        """One decode/prefill step across all stages; returns logits
        (the per-stage KV caches advance in place)."""
        n = len(self.stages)
        x = self._to_stage(tokens, 0)
        for s in range(n):
            out, self.caches[s] = self._run_stage(
                s, x, self.caches[s],
                first=(s == 0), last=(s == n - 1), fresh=fresh,
            )
            if s < n - 1:
                x = self._to_stage(out, s + 1)
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
                x = self._to_stage(
                    token_chunks[i] if s == 0 else acts[i], s
                )
                out, self.mb_caches[s][i] = self._run_stage(
                    s, x, self.mb_caches[s][i],
                    first=(s == 0), last=(s == n - 1),
                    fresh=fresh,
                )
                if s == n - 1:
                    outs[i] = out
                else:
                    acts[i] = out
        return outs


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "mesh", "axis", "dtype", "first", "last", "fresh",
    ),
)
def _stage_step_tp(
    stage: _Stage,
    x,  # (B, S) int32 tokens on stage 0, else (B, S, H) hidden
    cache: KVCache,
    specs: _Stage,
    mesh,
    axis: str = "model",
    dtype=jnp.bfloat16,
    first: bool = False,
    last: bool = False,
    fresh: bool = False,
):
    """One pipeline stage running Megatron-TP over its sub-mesh.

    The stage body is the shard_map'd block loop of
    ``parallel.tp.forward_tp`` restricted to this stage's blocks:
    activations enter/leave replicated over the TP axis (so the
    stage-to-stage ICI/DCN hop is one replicated activations
    transfer), weights/KV are sharded per ``specs``, and the only
    collectives are the two per-layer psums (+ the vocab all-gather
    on the last stage).
    """
    from vptq_tpu.parallel.tp import cache_tp_specs

    size = int(mesh.shape[axis])
    cache_specs = cache_tp_specs(cache, axis, None)

    def local(st, xx, c):
        cfg = st.cfg
        if first:
            xx = st.embed_tokens[xx].astype(dtype)
        seq = xx.shape[1]
        positions = (
            c.lengths[:, None]
            + jnp.arange(seq)[None, :].astype(jnp.int32)
        )
        inv_freq, rope_scale = rope_frequencies(cfg)
        cos, sin = rope_cos_sin(positions, inv_freq, rope_scale)
        for j, block in enumerate(st.blocks):
            h = rms_norm(xx, block.input_layernorm, cfg.rms_norm_eps)
            if isinstance(block.attn, MlaAttention):
                attn_out, c = _mla_attention(
                    j, block.attn, h, cos, sin, c, cfg,
                    tp=(axis, size),
                )
            else:
                attn_out, c = _attention(
                    j, block.attn, h, cos, sin, c, cfg,
                    fresh_prefill=fresh, tp=(axis, size),
                )
            xx = xx + attn_out
            h = rms_norm(
                xx, block.post_attention_layernorm, cfg.rms_norm_eps
            )
            xx = xx + _mlp(block.mlp, h, tp=(axis, size))
        c = KVCache(k=c.k, v=c.v, lengths=c.lengths + seq)
        if not last:
            return xx, c
        xx = rms_norm(xx, st.norm, cfg.rms_norm_eps)
        if st.lm_head is not None:
            logits = st.lm_head(xx)
            logits = jax.lax.all_gather(
                logits, axis, axis=logits.ndim - 1, tiled=True
            )
        else:
            logits = jnp.dot(
                xx,
                st.embed_tokens.T.astype(xx.dtype),
                preferred_element_type=jnp.float32,
            )
        return logits.astype(jnp.float32), c

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(), cache_specs),
        out_specs=(P(), cache_specs),
        check_vma=False,
    )(stage, x, cache)


class TPPipelineRunner(PipelineRunner):
    """PP × TP: pipeline stages that each span a tensor-parallel
    sub-mesh (VERDICT r2 item 8).

    ``devices`` is consumed as ``n_stages`` contiguous groups of
    ``tp`` chips; stage s's blocks are Megatron-placed over its own
    ``Mesh`` (parallel/tp.py rules: fused projections row-permuted,
    row-parallel layers block-encoded, KV sharded on heads).
    Activations hop between stages as ONE replicated transfer — the
    deployment shape for DCN-connected groups of ICI-connected chips:
    TP inside each group (latency axis), PP across groups (capacity
    axis, minimal cross-group traffic). The 1F microbatch schedule of
    :meth:`PipelineRunner.forward_pipelined` applies unchanged.
    """

    def __init__(
        self,
        model: Model,
        devices: Sequence,
        tp: int,
        max_seq: int = 2048,
        batch: int = 1,
        dtype=jnp.bfloat16,
        axis: str = "model",
    ):
        import numpy as np

        from vptq_tpu.parallel.sharding import make_mesh
        from vptq_tpu.parallel.tp import (
            _col_parallel,
            _put,
            shard_cache_tp,
            tp_place_block,
            tp_validate,
        )
        from jax.sharding import PartitionSpec as P

        devices = list(devices)
        if tp < 1 or len(devices) % tp:
            raise ValueError(
                f"{len(devices)} devices do not split into "
                f"tp={tp} groups"
            )
        n = len(devices) // tp
        L = len(model.blocks)
        if n < 1 or L < n:
            raise ValueError(
                f"{L} layers cannot spread over {n} stages"
            )
        tp_validate(
            model.cfg, tp, sharded_lm_head=model.lm_head is not None
        )
        if model.lm_head is None and n > 1:
            raise NotImplementedError(
                "tied-embedding lm_head on the last TP stage: load "
                "with an untied lm_head or use single-stage TP"
            )
        self.axis = axis
        self.dtype = dtype
        self.cfg = model.cfg
        self.meshes = [
            make_mesh(
                data=1, model=tp,
                devices=np.asarray(devices[s * tp: (s + 1) * tp]),
            )
            for s in range(n)
        ]
        self.stages: List[_Stage] = []
        self.stage_specs: List[_Stage] = []
        self.caches: List[KVCache] = []
        for s in range(n):
            mesh = self.meshes[s]
            idxs = [
                i for i in range(L) if pp_stage_of(i, L, n) == s
            ]
            placed, specs = [], []
            for i in idxs:
                b_p, b_s = tp_place_block(
                    model.blocks[i], mesh, axis, model.cfg
                )
                placed.append(b_p)
                specs.append(b_s)
            embed = embed_s = None
            if s == 0:
                embed = _put(model.embed_tokens, mesh, P())
                embed_s = P()
            norm = norm_s = lm = lm_s = None
            if s == n - 1:
                norm = _put(model.norm, mesh, P())
                norm_s = P()
                if model.lm_head is not None:
                    lm, lm_s = _col_parallel(
                        model.lm_head, mesh, axis
                    )
                else:
                    # tied embeddings (single-stage only — the n>1
                    # guard above): logits via the replicated embed,
                    # which the s==0 branch already placed
                    if embed is None:
                        embed = _put(model.embed_tokens, mesh, P())
                        embed_s = P()
            self.stages.append(
                _Stage(
                    blocks=tuple(placed), embed_tokens=embed,
                    norm=norm, lm_head=lm, cfg=model.cfg,
                )
            )
            self.stage_specs.append(
                _Stage(
                    blocks=tuple(specs), embed_tokens=embed_s,
                    norm=norm_s, lm_head=lm_s, cfg=model.cfg,
                )
            )
            full = init_cache(model.cfg, batch, max_seq, dtype)
            stage_cache = KVCache(
                k=full.k[: len(idxs)],
                v=full.v[: len(idxs)],
                lengths=full.lengths,
            )
            self.caches.append(shard_cache_tp(stage_cache, mesh, axis))

    def _to_stage(self, x, s: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.meshes[s], P()))

    def _run_stage(self, s: int, x, cache, first, last, fresh):
        return _stage_step_tp(
            self.stages[s], x, cache,
            specs=self.stage_specs[s], mesh=self.meshes[s],
            axis=self.axis, dtype=self.dtype,
            first=first, last=last, fresh=fresh,
        )
