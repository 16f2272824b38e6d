"""GSPMD sharding for VPTQ models.

The reference has no in-repo parallelism — multi-GPU is accelerate's
layer-to-device placement (reference: vptq/layers/model_base.py:186-194)
and TP lives in an external fork (documents/deepseek.md:36-88). Here
parallelism is first-class and TPU-native: one ``jax.sharding.Mesh``
with ``("data", "model")`` axes, Megatron-style tensor parallelism on
the quantized linears, and XLA-inserted collectives over ICI.

TP layout per layer role:
  * column-parallel (q/k/v/gate/up): index rows (out_features vectors)
    sharded over "model"; codebooks replicated (they are ~MB scale —
    SURVEY.md §5.8).
  * row-parallel (o/down): index columns (group_size / in_features)
    sharded over "model"; outputs all-reduced by GSPMD.
  * KV cache sharded over heads; activations data-parallel on batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.vqlinear import VQLinear
from vptq_tpu.models.llama import (
    Attention,
    Block,
    DeepseekMoe,
    KVCache,
    MlaAttention,
    Mlp,
    MoeMlp,
    Model,
)

__all__ = [
    "make_mesh",
    "shard_model",
    "shard_block",
    "shard_linear",
    "shard_cache",
    "replicated",
]


def make_mesh(
    data: int = 1, model: Optional[int] = None, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if model is None:
        model = len(devices) // data
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} devices"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def _put(x, mesh: Mesh, spec: P):
    if x is None:
        return None
    # Fall back to replication for any dimension the mesh axis does not
    # divide (tiny test models, odd head counts): shardings are
    # placement hints — correctness is GSPMD's job either way.
    fixed = []
    for dim, axes in enumerate(spec):
        if axes is None:
            fixed.append(None)
            continue
        axis_names = axes if isinstance(axes, tuple) else (axes,)
        size = 1
        for name in axis_names:
            size *= mesh.shape[name]
        fixed.append(axes if x.shape[dim] % size == 0 else None)
    sharding = NamedSharding(mesh, P(*fixed))
    if isinstance(x, jax.ShapeDtypeStruct):
        # abstract mode: attach the sharding without materializing —
        # used by tools/plan.py to AOT-compile 70B-geometry plans
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    return jax.device_put(x, sharding)


def _shard_vq(layer: VQLinear, mesh: Mesh, col_parallel: bool) -> VQLinear:
    if col_parallel:
        # shard out_features: ids axis 1 (num_indices = out vectors)
        ids_spec = P(None, "model", None)
        outlier_ids_spec = P(None, "model", None)
        bias_spec = P("model")
        norm_spec = P()  # (in_features,) replicated
    else:
        # shard in_features: ids axis 2 (group_size columns)
        ids_spec = P(None, None, "model")
        outlier_ids_spec = P(None, None, "model")
        bias_spec = P()
        norm_spec = P("model")
    # perm mixes arbitrary input columns; keep it replicated and let
    # GSPMD resolve the gather.
    return VQLinear(
        centroids=_put(layer.centroids, mesh, P()),
        ids=_put(layer.ids, mesh, ids_spec),
        res_centroids=_put(layer.res_centroids, mesh, P()),
        res_ids=_put(layer.res_ids, mesh, ids_spec),
        outlier_centroids=_put(layer.outlier_centroids, mesh, P()),
        outlier_ids=_put(layer.outlier_ids, mesh, outlier_ids_spec),
        inv_perm=_put(layer.inv_perm, mesh, P()),
        weight_scale=_put(layer.weight_scale, mesh, norm_spec),
        weight_bias=_put(layer.weight_bias, mesh, norm_spec),
        bias=_put(layer.bias, mesh, bias_spec),
        cfg=layer.cfg,
    )


def _shard_linear(layer, mesh: Mesh, col_parallel: bool):
    if layer is None:
        return None
    if isinstance(layer, VQLinear):
        return _shard_vq(layer, mesh, col_parallel)

    from vptq_tpu.layers.runtime import (
        Int3Linear,
        Int4Linear,
        Int8Linear,
    )

    if isinstance(layer, Int3Linear):
        # planes are (out, in/4|8); scales are out-MAJOR (out, S)
        if col_parallel:
            p_spec, s_spec, bias_spec = (
                P("model", None), P("model", None), P("model"),
            )
        else:
            p_spec, s_spec, bias_spec = (
                P(None, "model"), P(None, "model"), P(),
            )
        return Int3Linear(
            wq2=_put(layer.wq2, mesh, p_spec),
            wq1=_put(layer.wq1, mesh, p_spec),
            scales=_put(layer.scales, mesh, s_spec),
            bias=_put(layer.bias, mesh, bias_spec),
        )

    if isinstance(layer, Int8Linear):
        if col_parallel:
            wq_spec, s_spec, bias_spec = (
                P("model", None), P(None, "model"), P("model"),
            )
        else:
            wq_spec, s_spec, bias_spec = (
                P(None, "model"), P("model", None), P(),
            )
        return Int8Linear(
            wq=_put(layer.wq, mesh, wq_spec),
            scales=_put(layer.scales, mesh, s_spec),
            bias=_put(layer.bias, mesh, bias_spec),
        )

    if isinstance(layer, Int4Linear):
        # wq is (out, in/2); scales are transposed (in/128, out)
        if col_parallel:
            wq_spec, s_spec, bias_spec = (
                P("model", None), P(None, "model"), P("model"),
            )
        else:
            wq_spec, s_spec, bias_spec = (
                P(None, "model"), P("model", None), P(),
            )
        return Int4Linear(
            wq=_put(layer.wq, mesh, wq_spec),
            scales=_put(layer.scales, mesh, s_spec),
            bias=_put(layer.bias, mesh, bias_spec),
        )

    weight_spec = P("model", None) if col_parallel else P(None, "model")
    bias_spec = P("model") if col_parallel else P()
    return DenseLinear(
        weight=_put(layer.weight, mesh, weight_spec),
        bias=_put(layer.bias, mesh, bias_spec),
    )


def shard_linear(layer, mesh: Mesh, col_parallel: bool):
    """Public per-linear placement (used by the loader for lm_head)."""
    return _shard_linear(layer, mesh, col_parallel)


def _shard_mlp_dense(mlp, mesh):
    return Mlp(
        gate_proj=_shard_linear(mlp.gate_proj, mesh, True),
        up_proj=_shard_linear(mlp.up_proj, mesh, True),
        down_proj=_shard_linear(mlp.down_proj, mesh, False),
        gate_up_proj=_shard_linear(mlp.gate_up_proj, mesh, True),
    )


def _shard_moe_common(m, mesh: Mesh):
    """Expert-parallel placement for a MoE block's routed experts.

    Returns (stacked, experts, ep_mesh): when the stacked fast-path
    weights exist and the expert count divides the "model" axis, the
    stacked arrays are sharded on the EXPERT dimension (each device
    holds whole experts) and the per-expert copies are dropped —
    classic EP, forward via parallel.expert_parallel.moe_forward_ep.
    Otherwise falls back to Megatron-TP inside each expert.
    """
    from vptq_tpu.parallel.expert_parallel import shard_stacked_experts

    if m.stacked is not None:
        stacked = shard_stacked_experts(m.stacked, mesh, "model")
        if stacked is not None:
            return stacked, (), mesh
        if not m.experts:
            # experts don't divide the axis and per-expert copies are
            # gone: replicate the stacked arrays (single-device MoE
            # semantics under GSPMD)
            return replicated(m.stacked, mesh), (), None
    experts = tuple(_shard_mlp_dense(e, mesh) for e in m.experts)
    return None, experts, None


def shard_block(block: Block, mesh: Mesh) -> Block:
    """Place one decoder block's parameters with TP/EP PartitionSpecs.

    Called per block by :func:`shard_model`, and directly by the
    loader's sharded-ingestion path (models/loader.py) so each block
    is device_put onto the mesh as soon as it is re-encoded — a 70B
    model never exists whole on one host or one chip.
    """
    if isinstance(block.attn, MlaAttention):
        a = block.attn
        attn = MlaAttention(
            kv_a_proj=_shard_linear(a.kv_a_proj, mesh, False),
            kv_a_norm=_put(a.kv_a_norm, mesh, P()),
            kv_b_proj=(
                None
                if a.kv_b_proj is None
                else _shard_linear(a.kv_b_proj, mesh, True)
            ),
            o_proj=_shard_linear(a.o_proj, mesh, False),
            q_proj=_shard_linear(a.q_proj, mesh, True),
            q_a_proj=_shard_linear(a.q_a_proj, mesh, False),
            q_a_norm=_put(a.q_a_norm, mesh, P()),
            q_b_proj=_shard_linear(a.q_b_proj, mesh, True),
            # absorbed up-projections: heads axis sharded
            uk=_put(a.uk, mesh, P(None, "model", None)),
            uv=_put(a.uv, mesh, P(None, "model", None)),
        )
    else:
        attn = Attention(
            q_proj=_shard_linear(block.attn.q_proj, mesh, True),
            k_proj=_shard_linear(block.attn.k_proj, mesh, True),
            v_proj=_shard_linear(block.attn.v_proj, mesh, True),
            o_proj=_shard_linear(block.attn.o_proj, mesh, False),
            qkv_proj=_shard_linear(
                block.attn.qkv_proj, mesh, True
            ),
        )
    if isinstance(block.mlp, MoeMlp):
        m = block.mlp
        stacked, experts, ep_mesh = _shard_moe_common(m, mesh)
        mlp = MoeMlp(
            # router logits are (tokens, E)-tiny; replicate so
            # top-k runs without a collective
            router=replicated(m.router, mesh),
            experts=experts,
            num_experts_per_tok=m.num_experts_per_tok,
            stacked=stacked,
            ep_mesh=ep_mesh,
        )
    elif isinstance(block.mlp, DeepseekMoe):
        m = block.mlp
        stacked, experts, ep_mesh = _shard_moe_common(m, mesh)
        mlp = DeepseekMoe(
            router_weight=_put(m.router_weight, mesh, P()),
            correction_bias=_put(m.correction_bias, mesh, P()),
            experts=experts,
            shared_experts=_shard_mlp_dense(
                m.shared_experts, mesh
            ),
            top_k=m.top_k,
            n_group=m.n_group,
            topk_group=m.topk_group,
            norm_topk_prob=m.norm_topk_prob,
            routed_scaling_factor=m.routed_scaling_factor,
            stacked=stacked,
            ep_mesh=ep_mesh,
        )
    else:
        mlp = _shard_mlp_dense(block.mlp, mesh)
    return Block(
        input_layernorm=_put(block.input_layernorm, mesh, P()),
        attn=attn,
        post_attention_layernorm=_put(
            block.post_attention_layernorm, mesh, P()
        ),
        mlp=mlp,
    )


def shard_model(model: Model, mesh: Mesh) -> Model:
    """Place every parameter with its TP/EP PartitionSpec.

    Linears are Megatron-TP over the "model" axis; MoE ``stacked``
    expert weights are expert-parallel (sharded on the expert dim,
    see _shard_moe_common) so sharded decode still reads only the
    routed top-k experts' bytes per device.
    """
    return Model(
        embed_tokens=_put(model.embed_tokens, mesh, P()),
        blocks=tuple(shard_block(b, mesh) for b in model.blocks),
        norm=_put(model.norm, mesh, P()),
        lm_head=None
        if model.lm_head is None
        else _shard_linear(model.lm_head, mesh, True),
        cfg=model.cfg,
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """KV cache: batch over "data", heads over "model" (per layer)."""
    kv_spec = P("data", None, "model", None)
    return KVCache(
        k=tuple(_put(b, mesh, kv_spec) for b in cache.k),
        v=tuple(_put(b, mesh, kv_spec) for b in cache.v),
        lengths=_put(cache.lengths, mesh, P()),
    )


def replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: _put(x, mesh, P()), tree
    )
