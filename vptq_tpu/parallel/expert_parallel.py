"""Expert parallelism for MoE layers over the GSPMD mesh.

The reference has no in-repo parallelism at all (SURVEY.md §2.5); its
DeepSeek-R1 deployments rely on an external torchrun fork. Here EP is
first-class and TPU-native: the stacked expert weights are sharded
over the mesh's ``model`` axis on the EXPERT dimension (each device
holds E/D whole experts), routing decisions are computed replicated,
and each device evaluates only its local experts — decode reads only
the routed top-k experts' bytes per device — with a single ``psum``
over ICI combining the partial outputs.

Implemented with ``shard_map`` so the per-device computation reuses
the exact single-device kernels (w8/w4_matmul_pairs scalar-prefetch
dispatch); inside the mapped region everything is local, so no GSPMD
resharding can break the Pallas calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map  # jax >= 0.9 top-level API

__all__ = ["moe_forward_ep", "moe_local", "shard_stacked_experts"]


def moe_local(
    stacked_local,
    x: jnp.ndarray,  # (..., hidden) — replicated over the EP axis
    top_ids: jnp.ndarray,  # (..., k) int32 — GLOBAL expert ids
    top_w: jnp.ndarray,  # (..., k) f32
    num_experts: int,  # global expert count
    axis: str,
) -> jnp.ndarray:
    """Per-device EP body: evaluate this shard's local experts only
    and ``psum`` the partials. Must run inside a ``shard_map`` over
    ``axis`` (used by :func:`moe_forward_ep` and the whole-model TP
    forward, parallel/tp.py)."""
    from vptq_tpu.models.llama import (
        _MOE_FAST_MAX_TOKENS,
        _moe_dense_mix,
        _moe_fast,
    )

    e_local = stacked_local.gate_up_wq.shape[0]
    n_tokens = 1
    for d in x.shape[:-1]:
        n_tokens *= d
    shard = jax.lax.axis_index(axis)
    lo = (shard * e_local).astype(jnp.int32)
    if n_tokens <= _MOE_FAST_MAX_TOKENS:
        # decode: non-local (token, k) pairs are remapped to local
        # expert 0 with zero routing weight — every device runs the
        # same static pair grid, reading at most n*k expert tiles
        mine = jnp.logical_and(top_ids >= lo, top_ids < lo + e_local)
        ids = jnp.where(mine, top_ids - lo, 0)
        ws = jnp.where(mine, top_w, 0.0)
        out = _moe_fast(stacked_local, x, ids, ws).astype(jnp.float32)
    else:
        mix = jnp.sum(
            jax.nn.one_hot(top_ids, num_experts, dtype=jnp.float32)
            * top_w[..., None].astype(jnp.float32),
            axis=-2,
        )  # (..., E)
        mix_local = jax.lax.dynamic_slice_in_dim(
            mix, lo, e_local, axis=-1
        )
        out = _moe_dense_mix((), stacked_local, x, mix_local)
    return jax.lax.psum(out, axis)


def shard_stacked_experts(stacked, mesh: Mesh, axis: str = "model"):
    """Place stacked expert arrays expert-sharded over ``axis``.

    Returns None when the expert count does not divide the axis size
    (caller falls back to replicated stacked weights / TP experts).
    """
    from jax.sharding import NamedSharding

    from vptq_tpu.models.llama import StackedExperts

    n_shards = mesh.shape[axis]
    if stacked.gate_up_wq.shape[0] % n_shards:
        return None
    spec = NamedSharding(mesh, P(axis, None, None))

    def put(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            # abstract mode (tools/plan.py AOT planning)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=spec)
        return jax.device_put(x, spec)

    return StackedExperts(
        gate_up_wq=put(stacked.gate_up_wq),
        gate_up_scales=put(stacked.gate_up_scales),
        down_wq=put(stacked.down_wq),
        down_scales=put(stacked.down_scales),
        fmt=stacked.fmt,
    )


def moe_forward_ep(
    stacked,
    x: jnp.ndarray,  # (..., hidden) — replicated over the EP axis
    top_ids: jnp.ndarray,  # (..., k) int32
    top_w: jnp.ndarray,  # (..., k) f32
    num_experts: int,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Expert-parallel routed-experts forward.

    Each device holds ``E / mesh.shape[axis]`` whole experts. Decode
    (few tokens): (token, k) pairs whose expert is non-local are
    remapped to local expert 0 with zero routing weight — every device
    runs the same static pair grid, reading at most n*k local expert
    tiles; ``psum`` adds the partials. Prefill (many tokens): each
    device runs the dense all-experts loop over its LOCAL experts with
    the (..., E) mix weights sliced to its shard, then ``psum``.
    """
    from vptq_tpu.models.llama import StackedExperts

    n_shards = mesh.shape[axis]
    if num_experts % n_shards:
        raise ValueError(
            f"experts {num_experts} must divide EP shards {n_shards}"
        )

    def body(gu_wq, gu_s, d_wq, d_s, x, top_ids, top_w):
        local = StackedExperts(
            gate_up_wq=gu_wq, gate_up_scales=gu_s,
            down_wq=d_wq, down_scales=d_s, fmt=stacked.fmt,
        )
        return moe_local(local, x, top_ids, top_w, num_experts, axis)

    wspec = P(axis, None, None)
    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(wspec, wspec, wspec, wspec, P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(
        stacked.gate_up_wq,
        stacked.gate_up_scales,
        stacked.down_wq,
        stacked.down_scales,
        x,
        top_ids.astype(jnp.int32),
        top_w,
    )
    return out
