"""TPU-native vector-quantized linear layer.

Functional counterpart of the reference ``VQuantLinear`` module
(reference: vptq/layers/vqlinear.py:17-397): a pytree of normalized
arrays plus a static :class:`VQLinearConfig`. There is no nn.Module —
parameters flow through jit/pjit as pytrees, and sharding is expressed
with ``PartitionSpec`` on the arrays (see ``vptq_tpu.parallel``).

Normalized storage layout (chosen for TPU, not inherited from CUDA):

  * ``ids`` / ``res_ids``: separate unsigned planes (uint16 / uint8),
    the layout of the reference's v2 kernel (csrc/quant_gemv_v2.cu:28-33)
    — v1 bit-packed streams are unpacked once at ingestion.
  * codebooks in the activation dtype (bf16 by default).
  * permutation stored pre-inverted (``inv_perm``) so the runtime is a
    plain gather.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from vptq_tpu.config import VQLinearConfig
from vptq_tpu.ops.quant_matmul import quant_matmul

__all__ = ["VQLinear"]


@struct.dataclass
class VQLinear:
    """Parameters of one VPTQ linear layer (a pytree)."""

    # (num_codebooks, num_centroids, vector_len) float
    centroids: jnp.ndarray
    # (num_codebooks, num_indices, group_size) uint16/uint8
    ids: jnp.ndarray
    # residual stage (reference vqlinear.py:165-187)
    res_centroids: Optional[jnp.ndarray] = None
    res_ids: Optional[jnp.ndarray] = None
    # outlier stage (reference vqlinear.py:115-163)
    outlier_centroids: Optional[jnp.ndarray] = None
    outlier_ids: Optional[jnp.ndarray] = None
    # inverse input-column permutation, int32 (in_features,)
    inv_perm: Optional[jnp.ndarray] = None
    # per-input-channel norm (reference vqlinear.py:198-210)
    weight_scale: Optional[jnp.ndarray] = None
    weight_bias: Optional[jnp.ndarray] = None
    # output bias (out_features,)
    bias: Optional[jnp.ndarray] = None

    cfg: VQLinearConfig = struct.field(pytree_node=False, default=None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply ``x @ W^T + b`` with W reconstructed from codebooks.

        x: (..., in_features) -> (..., out_features).
        """
        return quant_matmul(x, self)

    @property
    def in_features(self) -> int:
        return self.cfg.in_features

    @property
    def out_features(self) -> int:
        return self.cfg.out_features
