"""vptq_tpu — a TPU-native inference engine for VPTQ-quantized LLMs.

JAX/XLA/Pallas re-design of the capabilities of microsoft/VPTQ: loads
HuggingFace checkpoints whose linear weights are vector-quantized
codebooks + index tensors, and serves generation with fused
dequant-matmul TPU kernels under a GSPMD device mesh.
"""

__version__ = "0.1.0"

from vptq_tpu.config import QuantizationConfig, VQLinearConfig
from vptq_tpu.layers.vqlinear import VQLinear

__all__ = [
    "AutoModelForCausalLM",
    "QuantizationConfig",
    "VQLinearConfig",
    "VQLinear",
    "__version__",
]


def __getattr__(name):
    # lazy: keeps `import vptq_tpu` light (no jax model imports)
    if name == "AutoModelForCausalLM":
        from vptq_tpu.api import AutoModelForCausalLM

        return AutoModelForCausalLM
    raise AttributeError(name)
