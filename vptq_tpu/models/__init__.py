from vptq_tpu.models.llama import (
    Block,
    KVCache,
    Model,
    ModelConfig,
    forward,
    init_cache,
)
from vptq_tpu.models.loader import load_model

__all__ = [
    "Block",
    "KVCache",
    "Model",
    "ModelConfig",
    "forward",
    "init_cache",
    "load_model",
]
