"""Fused quantized matmul: the single hot op of the framework.

The reference routes between two CUDA paths by token count
(reference: vptq/ops/quant_gemm.py:213-275): a fused dequant-GEMV for
decode and dequantize-then-cuBLAS for prefill. On TPU we use one design
for both: reconstruct weight *tiles* from the VMEM-resident codebooks
and feed them straight to the MXU, so the full bf16 weight matrix never
round-trips through HBM. The Pallas kernel implements that; this module
routes between it and a pure-XLA fallback that works on any backend.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from vptq_tpu.ops.dequant import dequant_weight

if TYPE_CHECKING:  # pragma: no cover
    from vptq_tpu.layers.vqlinear import VQLinear

__all__ = ["quant_matmul", "set_default_impl"]

_IMPL = os.environ.get("VPTQ_TPU_IMPL", "auto")


def set_default_impl(impl: str) -> None:
    """Select the kernel implementation: 'auto', 'pallas' or 'xla'."""
    global _IMPL
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown impl {impl!r}")
    _IMPL = impl


def use_pallas() -> bool:
    if _IMPL == "xla":
        return False
    backend = jax.default_backend()
    if _IMPL == "pallas":
        return True
    return backend == "tpu"


_use_pallas = use_pallas  # backwards-compat alias


def quant_matmul(x: jnp.ndarray, layer: "VQLinear") -> jnp.ndarray:
    """Compute ``x @ W^T + bias`` for a VPTQ layer.

    Args:
        x: activations (..., in_features), bf16/fp16/fp32.
        layer: the :class:`VQLinear` parameter pytree.

    Returns:
        (..., out_features) in ``x.dtype``.
    """
    cfg = layer.cfg
    if x.shape[-1] != cfg.in_features:
        raise ValueError(
            f"activation dim {x.shape[-1]} != in_features {cfg.in_features}"
        )

    # The compressed-codebook path always goes through XLA gather: the
    # per-element gather cannot be beaten in-kernel on TPU (see
    # ARCHITECTURE.md); fast serving uses the int8/bf16 runtime formats
    # in vptq_tpu.layers.runtime instead.
    out = _quant_matmul_xla(x, layer)

    if layer.bias is not None:
        out = out + layer.bias.astype(out.dtype)
    return out


def _quant_matmul_xla(x: jnp.ndarray, layer: "VQLinear") -> jnp.ndarray:
    """XLA fallback: reconstruct W then one dot (quant_gemm.py:230-275).

    XLA fuses the gather chain into the dot's operand where it can; on
    CPU this is the interpreter-grade reference path.
    """
    cfg = layer.cfg
    w = dequant_weight(
        centroids=layer.centroids.astype(x.dtype),
        ids=layer.ids.astype(jnp.int32),
        res_centroids=None
        if layer.res_centroids is None
        else layer.res_centroids.astype(x.dtype),
        res_ids=None if layer.res_ids is None else layer.res_ids.astype(
            jnp.int32
        ),
        outlier_centroids=None
        if layer.outlier_centroids is None
        else layer.outlier_centroids.astype(x.dtype),
        outlier_ids=None
        if layer.outlier_ids is None
        else layer.outlier_ids.astype(jnp.int32),
        inv_perm=layer.inv_perm,
        weight_scale=None
        if layer.weight_scale is None
        else layer.weight_scale.astype(x.dtype),
        weight_bias=None
        if layer.weight_bias is None
        else layer.weight_bias.astype(x.dtype),
        cfg=cfg,
    )
    return jnp.dot(
        x, w.T, preferred_element_type=jnp.float32
    ).astype(x.dtype)
