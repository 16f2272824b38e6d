from vptq_tpu.layers.vqlinear import VQLinear

__all__ = ["VQLinear"]
