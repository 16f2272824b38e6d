"""Calibrated re-encoding: error-feedback (GPTQ-style) quantization
and sensitivity-driven mixed precision for the dense runtime formats.

The offline complement of :mod:`vptq_tpu.layers.runtime`: instead of
rounding each weight group independently (RTN), the re-encode can use
calibration activations to (a) compensate rounding error column by
column against the layer's input second-moment (``gptq``) and (b) keep
the layers whose re-encode error moves the output most in int8
(``calibrate.quantize_model_calibrated``).
"""

from vptq_tpu.quant.calibrate import (
    quantize_model_calibrated,
    synthetic_calibration_tokens,
)
from vptq_tpu.quant.gptq import gptq_quantize

__all__ = [
    "gptq_quantize",
    "quantize_model_calibrated",
    "synthetic_calibration_tokens",
]
