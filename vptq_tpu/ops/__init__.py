from vptq_tpu.ops.dequant import dequant_weight
from vptq_tpu.ops.packing import pack_index, unpack_index
from vptq_tpu.ops.quant_matmul import quant_matmul, set_default_impl

__all__ = [
    "dequant_weight",
    "pack_index",
    "unpack_index",
    "quant_matmul",
    "set_default_impl",
]
