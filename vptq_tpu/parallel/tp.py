"""Whole-model shard_map tensor parallelism — the multi-chip hot path.

Why this exists: GSPMD cannot partition a ``pallas_call``. Under the
spec-annotation path (``parallel.sharding.shard_model``) XLA treats
the fused dequant-matmul kernels as opaque custom calls and inserts
**all-gathers of the full quantized weights around every matmul** —
measured on an interpret-mode CPU mesh: 8 weight all-gathers per
layer, output replicated. That silently turns tensor parallelism
into replication: a 70B int4 model sharded 8 ways would move
~34 GiB over ICI per decode step and materialize full matrices in
HBM. (The GSPMD path stays correct — and optimal — for the pure-XLA
``codebook``/CPU fallbacks; this module is the TPU kernel path.)

The fix is classic Megatron TP expressed with ``jax.shard_map``: the
WHOLE decode/prefill step runs in manual-mesh mode, every kernel call
sees only its device-local shard, and the only collectives are

- one ``psum`` after each row-parallel projection (o_proj, down_proj,
  MoE combine) — 2 (+1 MoE) per layer, activation-sized,
- one tiled ``all_gather`` of the vocab-sharded logits at the end.

Activations between a column-parallel layer and the following
row-parallel layer never reshard: the local attention heads (resp.
silu(gate_d)*up_d slice) ARE the local input columns of
o_proj (resp. down_proj).

Placement (``tp_place_model``) per layer role:

- column-parallel (qkv/gate/up/lm_head): shard the out axis. Fused
  q|k|v and gate|up projections are row-PERMUTED first so each
  device's contiguous shard is [q_d|k_d|v_d] (resp. [gate_d|up_d])
  and the local split inside the forward stays correct.
- row-parallel (o_proj, down_proj): the in axis is re-encoded in
  BLOCKED form (``layers.runtime._encode_int8/_encode_int4`` with
  ``shards=n``): each device's column block is quantized
  independently — scale groups never straddle shard boundaries, and
  each local shard is a self-contained standard layout for the
  kernels. (int4 pads each shard to the kernel's 2048-column tile;
  at 7B/8-way that costs ~4x on o_proj bytes — prefer int8 or fewer
  shards for small models; 70B-class shards are wide enough not to
  care.)
- MoE: stacked experts sharded on the EXPERT axis (each device holds
  whole experts); routing replicated; decode evaluates only local
  routed experts (``parallel.expert_parallel.moe_local``).
- embeddings / norms / router: replicated.

The reference has no in-repo parallelism (SURVEY.md §2.5) — its
multi-GPU story is accelerate's layer-wise device_map. This module is
the TPU-native replacement: one mesh, explicit ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.runtime import (
    Int2Linear,
    Int2MixedLinear,
    Int3Linear,
    Int3MixedLinear,
    Int4Linear,
    Int8Linear,
    _encode_int2,
    _encode_int3,
    _encode_int4,
    _encode_int8,
    int2_weight,
    int3_weight,
    int4_weight,
    int8_weight,
)
from vptq_tpu.models.llama import (
    Attention,
    Block,
    KVCache,
    MlaAttention,
    Mlp,
    Model,
    MoeMlp,
    StackedExperts,
    forward,
)

__all__ = [
    "tp_place_model",
    "tp_place_block",
    "tp_specs",
    "tp_validate",
    "forward_tp",
    "prefill_cp",
    "cache_tp_specs",
    "shard_cache_tp",
    "batch_axis",
]


def tp_validate(cfg, size: int, sharded_lm_head: bool = True) -> None:
    """Raise when the geometry cannot be Megatron-sharded ``size``
    ways (head/intermediate/vocab divisibility)."""
    checks = [("num_attention_heads", cfg.num_attention_heads)]
    if getattr(cfg, "is_mla", False):
        # MLA caches per attention head; kv head count is nh and
        # per-mlp widths (dense-replace / shared experts / routed)
        # are validated at placement time from the layers themselves
        pass
    else:
        checks += [
            ("num_key_value_heads", cfg.num_key_value_heads),
            ("intermediate_size", cfg.intermediate_size),
        ]
    if sharded_lm_head:
        checks.append(("vocab_size", cfg.vocab_size))
    for name, val in checks:
        if val % size:
            raise ValueError(
                f"{name}={val} does not divide TP size {size}"
            )


def tp_specs(model) -> "Model":
    """Derive the shard_map in_specs pytree from a PLACED model (each
    leaf's NamedSharding carries its PartitionSpec)."""

    def spec_of(x):
        sh = getattr(x, "sharding", None)
        return sh.spec if sh is not None and hasattr(sh, "spec") else P()

    return jax.tree.map(spec_of, model)


def _host(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _put(x, mesh: Mesh, spec: P):
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, spec))


def _fused_perm(sections, size: int) -> np.ndarray:
    """Row permutation turning [A|B|...] into per-shard [A_d|B_d|...].

    ``sections``: list of section lengths along the out axis; each
    must divide by ``size``.
    """
    perm = []
    offs = np.cumsum([0] + list(sections))
    for d in range(size):
        for sec, off in zip(sections, offs):
            blk = sec // size
            perm.extend(range(off + d * blk, off + (d + 1) * blk))
    return np.asarray(perm, dtype=np.int64)


def _permute_out(layer, perm: np.ndarray):
    """Reorder a linear's output rows by ``perm`` (host-side)."""
    if isinstance(layer, (Int8Linear, Int4Linear)):
        return type(layer)(
            wq=_host(layer.wq)[perm],
            scales=_host(layer.scales)[:, perm],
            bias=None if layer.bias is None else _host(layer.bias)[perm],
        )
    if isinstance(layer, Int3Linear):
        # every Int3Linear array (planes + out-major scales) is
        # row-major over out_features
        return Int3Linear(
            wq2=_host(layer.wq2)[perm],
            wq1=_host(layer.wq1)[perm],
            scales=_host(layer.scales)[perm],
            bias=None if layer.bias is None else _host(layer.bias)[perm],
        )
    if isinstance(layer, Int2Linear):
        # plane + out-major scales are row-major over out_features
        return Int2Linear(
            wq=_host(layer.wq)[perm],
            scales=_host(layer.scales)[perm],
            bias=None if layer.bias is None else _host(layer.bias)[perm],
        )
    if isinstance(layer, (Int3MixedLinear, Int2MixedLinear)):
        # both sides are row-major over out_features; the column
        # selection is input-side and unaffected
        base = (
            layer.int3
            if isinstance(layer, Int3MixedLinear)
            else layer.int2
        )
        kw = {
            "int3" if isinstance(layer, Int3MixedLinear) else "int2":
                _permute_out(base, perm)
        }
        return type(layer)(
            int8=_permute_out(layer.int8, perm),
            col_idx=layer.col_idx,
            bias=None if layer.bias is None else _host(layer.bias)[perm],
            **kw,
        )
    if isinstance(layer, DenseLinear):
        return DenseLinear(
            weight=_host(layer.weight)[perm],
            bias=None if layer.bias is None else _host(layer.bias)[perm],
        )
    raise NotImplementedError(
        f"shard_map TP does not support {type(layer).__name__}; "
        "use a runtime format (int8/int4/bf16) or the GSPMD path"
    )


def _col_parallel(layer, mesh, axis, perm: Optional[np.ndarray] = None):
    """Place a column-parallel linear: out axis sharded."""
    if perm is not None:
        layer = _permute_out(layer, perm)
    if isinstance(layer, (Int8Linear, Int4Linear)):
        placed = type(layer)(
            wq=_put(layer.wq, mesh, P(axis, None)),
            scales=_put(layer.scales, mesh, P(None, axis)),
            bias=_put(layer.bias, mesh, P(axis)),
        )
        spec = type(layer)(
            wq=P(axis, None), scales=P(None, axis),
            bias=None if layer.bias is None else P(axis),
        )
        return placed, spec
    if isinstance(layer, Int3Linear):
        placed = Int3Linear(
            wq2=_put(layer.wq2, mesh, P(axis, None)),
            wq1=_put(layer.wq1, mesh, P(axis, None)),
            scales=_put(layer.scales, mesh, P(axis, None)),
            bias=_put(layer.bias, mesh, P(axis)),
        )
        spec = Int3Linear(
            wq2=P(axis, None), wq1=P(axis, None),
            scales=P(axis, None),
            bias=None if layer.bias is None else P(axis),
        )
        return placed, spec
    if isinstance(layer, Int2Linear):
        placed = Int2Linear(
            wq=_put(layer.wq, mesh, P(axis, None)),
            scales=_put(layer.scales, mesh, P(axis, None)),
            bias=_put(layer.bias, mesh, P(axis)),
        )
        spec = Int2Linear(
            wq=P(axis, None), scales=P(axis, None),
            bias=None if layer.bias is None else P(axis),
        )
        return placed, spec
    if isinstance(layer, (Int3MixedLinear, Int2MixedLinear)):
        # out axis shards both sides; the column selection gathers
        # from the REPLICATED activations, so col_idx replicates
        base = (
            layer.int3
            if isinstance(layer, Int3MixedLinear)
            else layer.int2
        )
        name = "int3" if isinstance(layer, Int3MixedLinear) else "int2"
        pb, sb = _col_parallel(base, mesh, axis)
        p8, s8 = _col_parallel(layer.int8, mesh, axis)
        placed = type(layer)(
            int8=p8,
            col_idx=_put(layer.col_idx, mesh, P()),
            bias=_put(layer.bias, mesh, P(axis)),
            **{name: pb},
        )
        spec = type(layer)(
            int8=s8, col_idx=P(),
            bias=None if layer.bias is None else P(axis),
            **{name: sb},
        )
        return placed, spec
    if isinstance(layer, DenseLinear):
        placed = DenseLinear(
            weight=_put(layer.weight, mesh, P(axis, None)),
            bias=_put(layer.bias, mesh, P(axis)),
        )
        spec = DenseLinear(
            weight=P(axis, None),
            bias=None if layer.bias is None else P(axis),
        )
        return placed, spec
    raise NotImplementedError(
        f"shard_map TP does not support {type(layer).__name__}"
    )


def _row_parallel(
    layer, mesh, axis, size: int, logical_in: int,
    reencode: bool = True,
):
    """Place a row-parallel linear: in axis sharded, blocked encoding.

    ``logical_in`` is the unpadded in_features (from the model
    geometry) — the blocked re-encode must split the REAL columns,
    not the single-device zero padding.

    ``reencode=False``: the layer is ALREADY in blocked form (the
    loader encodes row-parallel layers with ``row_shards`` straight
    from the exact weights — one quantization, no decode/re-encode
    round-trip) and only needs placing.
    """
    if layer is not None and getattr(layer, "bias", None) is not None:
        raise NotImplementedError(
            "row-parallel layer with bias under shard_map TP (no "
            "supported family needs it: llama/mistral/qwen2/phi3 "
            "o_proj/down_proj are bias-free)"
        )
    if isinstance(layer, (Int3MixedLinear, Int2MixedLinear)):
        if reencode:
            raise NotImplementedError(
                "row-parallel int3-/int2-mixed must come pre-blocked "
                "from the calibrated encoder (load with calibration= "
                "and a TP mesh, quant/calibrate.py tp_shards) — an "
                "RTN re-encode would discard the calibrated column "
                "selection"
            )
        # calibrated blocked form: base planes shard their in axis,
        # the int8 side matrix holds each shard's selected columns
        # contiguously (wq in-axis sharded, per-shard scale rows),
        # col_idx carries SHARD-LOCAL ids into the local x block
        if isinstance(layer, Int3MixedLinear):
            base_p = Int3Linear(
                wq2=_put(layer.int3.wq2, mesh, P(None, axis)),
                wq1=_put(layer.int3.wq1, mesh, P(None, axis)),
                scales=_put(layer.int3.scales, mesh, P(None, axis)),
                bias=None,
            )
            base_s = Int3Linear(
                wq2=P(None, axis), wq1=P(None, axis),
                scales=P(None, axis), bias=None,
            )
            name = "int3"
        else:
            base_p = Int2Linear(
                wq=_put(layer.int2.wq, mesh, P(None, axis)),
                scales=_put(layer.int2.scales, mesh, P(None, axis)),
                bias=None,
            )
            base_s = Int2Linear(
                wq=P(None, axis), scales=P(None, axis), bias=None
            )
            name = "int2"
        placed = type(layer)(
            int8=Int8Linear(
                wq=_put(layer.int8.wq, mesh, P(None, axis)),
                scales=_put(layer.int8.scales, mesh, P(axis, None)),
                bias=None,
            ),
            col_idx=_put(layer.col_idx, mesh, P(axis)),
            bias=None,
            **{name: base_p},
        )
        spec = type(layer)(
            int8=Int8Linear(
                wq=P(None, axis), scales=P(axis, None), bias=None
            ),
            col_idx=P(axis),
            bias=None,
            **{name: base_s},
        )
        return placed, spec
    if not reencode and isinstance(
        layer, (Int8Linear, Int4Linear, Int3Linear, Int2Linear)
    ):
        blocked = layer
    elif isinstance(layer, Int8Linear):
        w = int8_weight(layer)[:, :logical_in]
        blocked = _encode_int8(w, None, shards=size)
    elif isinstance(layer, Int4Linear):
        w = int4_weight(layer)[:, :logical_in]
        blocked = _encode_int4(w, None, shards=size)
    elif isinstance(layer, Int3Linear):
        w = int3_weight(layer)[:, :logical_in]
        blocked = _encode_int3(w, None, shards=size)
    elif isinstance(layer, Int2Linear):
        w = int2_weight(layer)[:, :logical_in]
        blocked = _encode_int2(w, None, shards=size)
    elif isinstance(layer, DenseLinear):
        w = _host(layer.weight)[:, :logical_in]
        pad = (-w.shape[1]) % size
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)))
        placed = DenseLinear(
            weight=_put(
                jnp.asarray(w, layer.weight.dtype), mesh, P(None, axis)
            ),
            bias=None,
        )
        return placed, DenseLinear(weight=P(None, axis), bias=None)
    else:
        raise NotImplementedError(
            f"shard_map TP does not support {type(layer).__name__}"
        )
    if isinstance(blocked, Int3Linear):
        # planes and out-major scales all shard their in axis (dim 1)
        placed = Int3Linear(
            wq2=_put(blocked.wq2, mesh, P(None, axis)),
            wq1=_put(blocked.wq1, mesh, P(None, axis)),
            scales=_put(blocked.scales, mesh, P(None, axis)),
            bias=None,
        )
        spec = Int3Linear(
            wq2=P(None, axis), wq1=P(None, axis),
            scales=P(None, axis), bias=None,
        )
        return placed, spec
    if isinstance(blocked, Int2Linear):
        placed = Int2Linear(
            wq=_put(blocked.wq, mesh, P(None, axis)),
            scales=_put(blocked.scales, mesh, P(None, axis)),
            bias=None,
        )
        spec = Int2Linear(
            wq=P(None, axis), scales=P(None, axis), bias=None
        )
        return placed, spec
    placed = type(blocked)(
        wq=_put(blocked.wq, mesh, P(None, axis)),
        scales=_put(blocked.scales, mesh, P(axis, None)),
        bias=None,
    )
    spec = type(blocked)(
        wq=P(None, axis), scales=P(axis, None), bias=None
    )
    return placed, spec


def _out_features(lin) -> int:
    if isinstance(lin, DenseLinear):
        return int(lin.weight.shape[0])
    if isinstance(lin, Int3Linear):
        return int(lin.wq2.shape[0])
    if isinstance(lin, Int3MixedLinear):
        return int(lin.int3.wq2.shape[0])
    if isinstance(lin, Int2MixedLinear):
        return int(lin.int2.wq.shape[0])
    return int(lin.wq.shape[0])


def _place_mlp(
    mlp: Mlp, mesh, axis, size,
    reencode_rows: bool = True,
):
    # derive the logical intermediate size from the layer itself so
    # shared-expert / dense-replace mlps (whose width differs from
    # cfg.intermediate_size) place correctly
    if mlp.gate_up_proj is not None:
        inter = _out_features(mlp.gate_up_proj) // 2
        perm = _fused_perm([inter, inter], size)
        gu, gu_s = _col_parallel(mlp.gate_up_proj, mesh, axis, perm)
        gate = up = gate_s = up_s = None
    else:
        inter = _out_features(mlp.gate_proj)
        gu = gu_s = None
        gate, gate_s = _col_parallel(mlp.gate_proj, mesh, axis)
        up, up_s = _col_parallel(mlp.up_proj, mesh, axis)
    if inter % size:
        raise ValueError(
            f"mlp intermediate {inter} does not divide TP size {size}"
        )
    down, down_s = _row_parallel(
        mlp.down_proj, mesh, axis, size, inter,
        reencode=reencode_rows,
    )
    placed = Mlp(
        gate_proj=gate, up_proj=up, down_proj=down, gate_up_proj=gu
    )
    spec = Mlp(
        gate_proj=gate_s, up_proj=up_s, down_proj=down_s,
        gate_up_proj=gu_s,
    )
    return placed, spec


def _place_moe(moe: MoeMlp, mesh, axis, size):
    if moe.stacked is None:
        raise NotImplementedError(
            "shard_map TP MoE requires stacked experts (fuse_model)"
        )
    n_experts = moe.stacked.gate_up_wq.shape[0]
    if n_experts % size:
        raise NotImplementedError(
            f"experts {n_experts} must divide TP size {size}"
        )
    router, router_s = _replicated_linear(moe.router, mesh)
    e_spec = P(axis, None, None)
    stacked = StackedExperts(
        gate_up_wq=_put(moe.stacked.gate_up_wq, mesh, e_spec),
        gate_up_scales=_put(moe.stacked.gate_up_scales, mesh, e_spec),
        down_wq=_put(moe.stacked.down_wq, mesh, e_spec),
        down_scales=_put(moe.stacked.down_scales, mesh, e_spec),
        fmt=moe.stacked.fmt,
    )
    stacked_s = StackedExperts(
        gate_up_wq=e_spec, gate_up_scales=e_spec,
        down_wq=e_spec, down_scales=e_spec, fmt=moe.stacked.fmt,
    )
    placed = MoeMlp(
        router=router, experts=(),
        num_experts_per_tok=moe.num_experts_per_tok,
        stacked=stacked,
    )
    spec = MoeMlp(
        router=router_s, experts=(),
        num_experts_per_tok=moe.num_experts_per_tok,
        stacked=stacked_s,
    )
    return placed, spec


def _place_mla(attn, mesh, axis, size, cfg, reencode_rows=True):
    """MLA placement: compressed projections (q_a / kv_a + norms)
    replicated — they are shared across heads — per-head tensors
    (q / q_b and the absorbed uk/uv) column-parallel over heads,
    o_proj row-parallel over heads (logical in = nh * v_head_dim).
    Head rows are contiguous per head, so no permutation is needed.
    The latent cache is replicated over the TP axis (its single
    shared "head" cannot shard)."""
    if attn.uk is None:
        raise ValueError(
            "MLA TP placement needs the absorbed uk/uv "
            "(layers.runtime.absorb_mla)"
        )
    nh = cfg.num_attention_heads
    q = q_s = q_a = q_a_s = q_b = q_b_s = None
    q_a_norm = q_a_norm_s = None
    if attn.q_proj is not None:
        q, q_s = _col_parallel(attn.q_proj, mesh, axis)
    else:
        q_a, q_a_s = _replicated_linear(attn.q_a_proj, mesh)
        q_a_norm = _put(attn.q_a_norm, mesh, P())
        q_a_norm_s = P()
        q_b, q_b_s = _col_parallel(attn.q_b_proj, mesh, axis)
    kv_a, kv_a_s = _replicated_linear(attn.kv_a_proj, mesh)
    u_spec = P(None, axis, None)
    o, o_s = _row_parallel(
        attn.o_proj, mesh, axis, size, nh * cfg.v_head_dim,
        reencode=reencode_rows,
    )
    placed = MlaAttention(
        kv_a_proj=kv_a,
        kv_a_norm=_put(attn.kv_a_norm, mesh, P()),
        kv_b_proj=None,
        o_proj=o,
        q_proj=q,
        q_a_proj=q_a,
        q_a_norm=q_a_norm,
        q_b_proj=q_b,
        uk=_put(attn.uk, mesh, u_spec),
        uv=_put(attn.uv, mesh, u_spec),
    )
    spec = MlaAttention(
        kv_a_proj=kv_a_s,
        kv_a_norm=P(),
        kv_b_proj=None,
        o_proj=o_s,
        q_proj=q_s,
        q_a_proj=q_a_s,
        q_a_norm=q_a_norm_s,
        q_b_proj=q_b_s,
        uk=u_spec,
        uv=u_spec,
    )
    return placed, spec


def _place_deepseek_moe(moe, mesh, axis, size, reencode_rows=True):
    from vptq_tpu.models.llama import DeepseekMoe

    if moe.stacked is None:
        raise NotImplementedError(
            "shard_map TP DeepseekMoe requires stacked experts "
            "(fuse_model)"
        )
    n_experts = moe.stacked.gate_up_wq.shape[0]
    if n_experts % size:
        raise NotImplementedError(
            f"routed experts {n_experts} must divide TP size {size}"
        )
    e_spec = P(axis, None, None)
    stacked = StackedExperts(
        gate_up_wq=_put(moe.stacked.gate_up_wq, mesh, e_spec),
        gate_up_scales=_put(moe.stacked.gate_up_scales, mesh, e_spec),
        down_wq=_put(moe.stacked.down_wq, mesh, e_spec),
        down_scales=_put(moe.stacked.down_scales, mesh, e_spec),
        fmt=moe.stacked.fmt,
    )
    stacked_s = StackedExperts(
        gate_up_wq=e_spec, gate_up_scales=e_spec,
        down_wq=e_spec, down_scales=e_spec, fmt=moe.stacked.fmt,
    )
    shared, shared_s = _place_mlp(
        moe.shared_experts, mesh, axis, size,
        reencode_rows=reencode_rows,
    )
    statics = dict(
        top_k=moe.top_k,
        n_group=moe.n_group,
        topk_group=moe.topk_group,
        norm_topk_prob=moe.norm_topk_prob,
        routed_scaling_factor=moe.routed_scaling_factor,
    )
    placed = DeepseekMoe(
        router_weight=_put(moe.router_weight, mesh, P()),
        correction_bias=_put(moe.correction_bias, mesh, P()),
        experts=(),
        shared_experts=shared,
        stacked=stacked,
        **statics,
    )
    spec = DeepseekMoe(
        router_weight=P(),
        correction_bias=P(),
        experts=(),
        shared_experts=shared_s,
        stacked=stacked_s,
        **statics,
    )
    return placed, spec


def _replicated_linear(layer, mesh):
    if layer is None:
        return None, None
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    placed = jax.tree_util.tree_unflatten(
        treedef, [_put(leaf, mesh, P()) for leaf in leaves]
    )
    spec = jax.tree_util.tree_unflatten(
        treedef, [P() for _ in leaves]
    )
    return placed, spec


def tp_place_block(
    block: Block,
    mesh: Mesh,
    axis: str,
    cfg,
    reencode_rows: bool = True,
) -> Tuple[Block, Block]:
    """Place one decoder block (used per-block by the loader's
    sharded ingestion so host memory peaks at one block).

    ``reencode_rows=False`` when row-parallel layers were already
    encoded blocked (``to_runtime(..., row_shards=n)``)."""
    size = mesh.shape[axis]
    nh, nkv, hd = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    from vptq_tpu.models.llama import DeepseekMoe

    attn = block.attn
    if isinstance(attn, MlaAttention):
        attn_p, attn_s = _place_mla(
            attn, mesh, axis, size, cfg, reencode_rows=reencode_rows
        )
    else:
        if attn.qkv_proj is not None:
            perm = _fused_perm([nh * hd, nkv * hd, nkv * hd], size)
            qkv, qkv_s = _col_parallel(
                attn.qkv_proj, mesh, axis, perm
            )
            q = k = v = q_s = k_s = v_s = None
        else:
            qkv = qkv_s = None
            q, q_s = _col_parallel(attn.q_proj, mesh, axis)
            k, k_s = _col_parallel(attn.k_proj, mesh, axis)
            v, v_s = _col_parallel(attn.v_proj, mesh, axis)
        o, o_s = _row_parallel(
            attn.o_proj, mesh, axis, size, nh * hd,
            reencode=reencode_rows,
        )
        attn_p = Attention(
            q_proj=q, k_proj=k, v_proj=v, o_proj=o, qkv_proj=qkv
        )
        attn_s = Attention(
            q_proj=q_s, k_proj=k_s, v_proj=v_s, o_proj=o_s,
            qkv_proj=qkv_s,
        )
    if isinstance(block.mlp, MoeMlp):
        mlp_p, mlp_s = _place_moe(block.mlp, mesh, axis, size)
    elif isinstance(block.mlp, DeepseekMoe):
        mlp_p, mlp_s = _place_deepseek_moe(
            block.mlp, mesh, axis, size, reencode_rows=reencode_rows
        )
    else:
        mlp_p, mlp_s = _place_mlp(
            block.mlp, mesh, axis, size,
            reencode_rows=reencode_rows,
        )
    placed = Block(
        input_layernorm=_put(block.input_layernorm, mesh, P()),
        attn=attn_p,
        post_attention_layernorm=_put(
            block.post_attention_layernorm, mesh, P()
        ),
        mlp=mlp_p,
    )
    spec = Block(
        input_layernorm=P(),
        attn=attn_s,
        post_attention_layernorm=P(),
        mlp=mlp_s,
    )
    return placed, spec


def tp_place_model(
    model: Model, mesh: Mesh, axis: str = "model",
    reencode_rows: bool = True,
) -> Tuple[Model, Model]:
    """Megatron-TP placement of a fused runtime model onto ``mesh``.

    Returns ``(model_tp, specs)``. The placed pytree is ONLY valid
    through :func:`forward_tp` (row-parallel layers use the blocked
    encoding; fused projections are row-permuted) — do not call the
    plain ``forward`` on it. ``reencode_rows=False`` when row-parallel
    layers are ALREADY blocked (e.g. the calibrated encoder with
    ``tp_shards``).
    """
    cfg = model.cfg
    size = mesh.shape[axis]
    tp_validate(cfg, size, sharded_lm_head=model.lm_head is not None)

    blocks, block_specs = [], []
    for block in model.blocks:
        block_p, block_s = tp_place_block(
            block, mesh, axis, cfg, reencode_rows=reencode_rows
        )
        blocks.append(block_p)
        block_specs.append(block_s)

    if model.lm_head is not None:
        lm_head, lm_head_s = _col_parallel(model.lm_head, mesh, axis)
        # untied: the embedding table shards over vocab too (the
        # forward does a local-range lookup + psum)
        embed_spec = P(axis, None)
    else:
        lm_head = lm_head_s = None
        embed_spec = P()  # tied: used as lm_head weight, replicated
    placed = Model(
        embed_tokens=_put(model.embed_tokens, mesh, embed_spec),
        blocks=tuple(blocks),
        norm=_put(model.norm, mesh, P()),
        lm_head=lm_head,
        cfg=cfg,
    )
    specs = Model(
        embed_tokens=embed_spec,
        blocks=tuple(block_specs),
        norm=P(),
        lm_head=lm_head_s,
        cfg=cfg,
    )
    return placed, specs


def batch_axis(mesh, batch: int, data_axis: str = "data"):
    """The mesh axis the batch dim rides: ``data`` when it divides
    the batch (DP×TP), else None (replicated — e.g. batch-1 serving
    on a mesh whose data axis is used for context parallelism)."""
    size = int(mesh.shape.get(data_axis, 1))
    return data_axis if size > 1 and batch % size == 0 else None


def cache_tp_specs(
    cache: KVCache, axis: str = "model", data_axis=None
) -> KVCache:
    """KV cache specs: batch over ``data_axis`` (None = replicated),
    heads over the TP axis (matches the local attention heads). An
    MLA latent cache has ONE shared "head" — it stays replicated
    over the TP axis (tiny: kv_lora+rope dims per token)."""

    def spec(buf):
        heads = axis if int(buf.shape[2]) > 1 else None
        return P(data_axis, None, heads, None)

    return KVCache(
        k=tuple(spec(b) for b in cache.k),
        v=tuple(spec(b) for b in cache.v),
        lengths=P(data_axis),
    )


def shard_cache_tp(cache: KVCache, mesh: Mesh, axis: str = "model"):
    specs = cache_tp_specs(
        cache, axis, batch_axis(mesh, int(cache.lengths.shape[0]))
    )
    return jax.tree.map(
        lambda x, s: _put(x, mesh, s),
        cache,
        specs,
        is_leaf=lambda x: x is None,
    )


@functools.partial(
    jax.jit,
    static_argnames=("specs", "mesh", "tp_axis", "cp_axis", "dtype"),
    donate_argnums=(2,),
)
def prefill_cp(
    model_tp: Model,
    tokens: jnp.ndarray,  # (B, S) int32 — S sharded over cp_axis
    cache: KVCache,
    specs: Model,
    mesh: Mesh,
    tp_axis: str = "model",
    cp_axis: str = "data",
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Context-parallel fresh prefill: the prompt's sequence chunks
    are sharded over ``cp_axis`` (each device runs the full decoder
    on its chunk — per-token work is embarrassingly parallel) while
    attention runs as a K/V ppermute ring (parallel/ring.py) and
    tensor parallelism over ``tp_axis`` as usual. The KV cache comes
    back replicated over ``cp_axis`` with the full prefix written —
    ready for TP decode. S must divide the cp axis size.

    The reference has no sequence parallelism at all; long-context
    prefill there is bounded by one GPU (SURVEY §5.7).
    """
    tp_size = int(mesh.shape[tp_axis])
    cp_size = int(mesh.shape[cp_axis])
    if tokens.shape[1] % cp_size:
        raise ValueError(
            f"prompt length {tokens.shape[1]} must divide "
            f"cp={cp_size} chunks"
        )
    cache_specs = cache_tp_specs(cache, tp_axis, None)

    def local(m, t, c):
        return forward(
            m, t, c, dtype=dtype, fresh_prefill=True,
            tp=(tp_axis, tp_size), cp=(cp_axis, cp_size),
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(None, cp_axis), cache_specs),
        out_specs=(P(None, cp_axis), cache_specs),
        check_vma=False,
    )(model_tp, tokens, cache)


@functools.partial(
    jax.jit,
    static_argnames=("specs", "mesh", "axis", "dtype", "fresh_prefill"),
    donate_argnums=(2,),
)
def forward_tp(
    model_tp: Model,
    tokens: jnp.ndarray,  # (B, S) int32
    cache: KVCache,
    specs: Model,
    mesh: Mesh,
    axis: str = "model",
    dtype=jnp.bfloat16,
    fresh_prefill: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """Tensor-parallel decode/prefill step over ``mesh``.

    ``model_tp``/``specs`` come from :func:`tp_place_model`; the cache
    must be placed with :func:`shard_cache_tp`. The batch dim rides
    the mesh's ``data`` axis (DP×TP; a size-1 data axis makes that a
    no-op). Logits come back vocab-complete, batch-sharded over
    ``data``; the cache stays sharded.
    """
    size = mesh.shape[axis]
    b_ax = batch_axis(mesh, int(tokens.shape[0]))
    cache_specs = cache_tp_specs(cache, axis, b_ax)

    def local(m, t, c):
        return forward(
            m, t, c, dtype=dtype, fresh_prefill=fresh_prefill,
            tp=(axis, size),
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(b_ax), cache_specs),
        out_specs=(P(b_ax), cache_specs),
        check_vma=False,
    )(model_tp, tokens, cache)
