"""Dense (unquantized) linear layer.

VPTQ checkpoints leave some modules in plain bf16 — typically
embeddings and ``lm_head`` (reference replaces only modules listed in
``quantization_config``, model_base.py:41-47). This is their runtime
counterpart, interchangeable with :class:`VQLinear`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

__all__ = ["DenseLinear"]


@struct.dataclass
class DenseLinear:
    weight: jnp.ndarray  # (out_features, in_features)
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = jnp.dot(
            x, self.weight.T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def in_features(self) -> int:
        return self.weight.shape[1]

    @property
    def out_features(self) -> int:
        return self.weight.shape[0]
