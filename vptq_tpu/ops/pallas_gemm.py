"""Pallas TPU kernels for fused VPTQ dequant + matmul.

Placeholder delegating to the XLA path; replaced by the real
codebook-in-VMEM kernel (design: SURVEY.md §7 step 2, modeled on the
reference's shared-memory v2 kernel csrc/kernels/quant_gemv_v2.cuh).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax.numpy as jnp

if TYPE_CHECKING:  # pragma: no cover
    from vptq_tpu.layers.vqlinear import VQLinear

__all__ = ["quant_matmul_pallas"]


def quant_matmul_pallas(x: jnp.ndarray, layer: "VQLinear") -> jnp.ndarray:
    from vptq_tpu.ops.quant_matmul import _quant_matmul_xla

    return _quant_matmul_xla(x, layer)
