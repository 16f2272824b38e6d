"""Reconstruction diagnostics for quantized layers.

Keeps the useful part of the reference's debug surface: the proxy
reconstruction error of ``VQuantLinear.get_error`` (reference
vqlinear.py:486-518) — mean Hessian-weighted error of the
reconstructed weight vs the original — without the broken
``proxy_error_forward`` path (reference §3.6 of SURVEY.md).

``model_reconstruction_report`` measures the fidelity of the TPU
runtime re-encode: for every linear it compares the runtime weights
(int8/int4/bf16 dequantized on the host) against the exact VPTQ
reconstruction of the same layer in a reference (codebook-format)
model, reporting per-layer relative RMS and worst-case error.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vptq_tpu.layers.runtime import _exact_weight
from vptq_tpu.layers.vqlinear import VQLinear

__all__ = [
    "reconstruction_error",
    "runtime_weight",
    "model_reconstruction_report",
]


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


def runtime_weight(lin) -> Optional[np.ndarray]:
    """Materialize a linear's effective weight matrix as host f32.

    Covers every runtime format: Int8Linear / Int4Linear group-dequant
    (including the in_features zero-padding, which is kept — callers
    trim against the reference width), DenseLinear pass-through, and
    VQLinear exact reconstruction.
    """
    import jax

    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import (
        Int3Linear,
        Int4Linear,
        Int8Linear,
        int3_weight,
    )
    from vptq_tpu.ops.packing import unpack_int4

    if lin is None:
        return None
    if isinstance(lin, VQLinear):
        return _exact_weight(lin)
    if isinstance(lin, Int3Linear):
        return int3_weight(lin)
    if isinstance(lin, DenseLinear):
        return np.asarray(jax.device_get(lin.weight), np.float32)
    if isinstance(lin, Int8Linear):
        wq = np.asarray(jax.device_get(lin.wq), np.float32)
        scales = np.asarray(jax.device_get(lin.scales), np.float32)
        group = lin.group
        return (
            wq.reshape(wq.shape[0], -1, group) * scales.T[:, :, None]
        ).reshape(wq.shape)
    if isinstance(lin, Int4Linear):
        packed = np.asarray(jax.device_get(lin.wq))
        q = unpack_int4(packed).astype(np.float32)
        scales = np.asarray(
            jax.device_get(lin.scales), np.float32
        )  # (in_p/128, out)
        return (
            q.reshape(q.shape[0], -1, 128) * scales.T[:, :, None]
        ).reshape(q.shape[0], -1)
    raise TypeError(f"unknown linear type {type(lin).__name__}")


def _fmt_name(lin) -> str:
    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import (
        Int3Linear,
        Int4Linear,
        Int8Linear,
    )

    if isinstance(lin, VQLinear):
        return "codebook"
    if isinstance(lin, Int8Linear):
        return "int8"
    if isinstance(lin, Int4Linear):
        return "int4"
    if isinstance(lin, Int3Linear):
        return "int3"
    if isinstance(lin, DenseLinear):
        return "bf16"
    return type(lin).__name__


def _compare(name, runtime_lin, ref_weights, report):
    """Relative RMS / max-abs between a runtime linear and the exact
    reconstruction (``ref_weights``: list of (out, in) f32 blocks,
    row-concatenated for fused projections)."""
    if runtime_lin is None:
        return
    w_ref = (
        ref_weights[0]
        if len(ref_weights) == 1
        else np.concatenate(ref_weights, axis=0)
    )
    w_rt = runtime_weight(runtime_lin)
    # runtime formats zero-pad in_features; trim to the reference width
    w_rt = w_rt[:, : w_ref.shape[1]]
    if w_rt.shape != w_ref.shape:
        report[name] = {
            "format": _fmt_name(runtime_lin),
            "error": float("nan"),
            "note": f"shape {w_rt.shape} vs {w_ref.shape}",
        }
        return
    delta = w_rt - w_ref
    ref_rms = float(np.sqrt(np.mean(w_ref**2)))
    report[name] = {
        "format": _fmt_name(runtime_lin),
        "rel_rms": float(np.sqrt(np.mean(delta**2)))
        / (ref_rms + 1e-30),
        "max_abs_err": float(np.max(np.abs(delta))),
        "ref_rms": ref_rms,
    }


def _ref_w(lin):
    w = runtime_weight(lin)
    if w is None:
        raise ValueError(
            "reference model has a missing linear where the runtime "
            "model has one — load both models from the same checkpoint"
        )
    return w


def model_reconstruction_report(
    model, reference
) -> Dict[str, Dict[str, float]]:
    """Per-layer runtime re-encoding fidelity vs exact reconstruction.

    ``model`` is the serving model (any runtime format, fused or not);
    ``reference`` is the same checkpoint loaded with
    ``runtime_format="codebook"`` (exact) and ``fuse=False``. For every
    linear the runtime weights are materialized on the host and
    compared against the exact VPTQ reconstruction; fused q|k|v and
    gate|up projections are compared against the row-concatenation of
    their reference parts. Covers int8 / int4 / bf16 / codebook.
    """
    from vptq_tpu.models.llama import DeepseekMoe, MlaAttention, MoeMlp

    report: Dict[str, Dict[str, float]] = {}

    def attn_pairs(p, a, ra):
        if isinstance(a, MlaAttention):
            for name in ("kv_a_proj", "kv_b_proj", "o_proj", "q_proj",
                         "q_a_proj", "q_b_proj"):
                lin = getattr(a, name, None)
                if lin is not None:
                    _compare(
                        f"{p}.{name}", lin,
                        [_ref_w(getattr(ra, name))], report,
                    )
            return
        if a.qkv_proj is not None:
            if getattr(ra, "qkv_proj", None) is not None:
                refs = [_ref_w(ra.qkv_proj)]
            else:
                refs = [
                    _ref_w(ra.q_proj),
                    _ref_w(ra.k_proj),
                    _ref_w(ra.v_proj),
                ]
            _compare(f"{p}.qkv_proj", a.qkv_proj, refs, report)
        else:
            for name in ("q_proj", "k_proj", "v_proj"):
                _compare(
                    f"{p}.{name}", getattr(a, name),
                    [_ref_w(getattr(ra, name))], report,
                )
        _compare(f"{p}.o_proj", a.o_proj, [_ref_w(ra.o_proj)], report)

    def mlp_pairs(p, m, rm):
        if m.gate_up_proj is not None:
            if getattr(rm, "gate_up_proj", None) is not None:
                refs = [_ref_w(rm.gate_up_proj)]
            else:
                refs = [_ref_w(rm.gate_proj), _ref_w(rm.up_proj)]
            _compare(f"{p}.gate_up_proj", m.gate_up_proj, refs, report)
        else:
            for name in ("gate_proj", "up_proj"):
                lin = getattr(m, name)
                if lin is not None:
                    _compare(
                        f"{p}.{name}", lin,
                        [_ref_w(getattr(rm, name))], report,
                    )
        _compare(
            f"{p}.down_proj", m.down_proj, [_ref_w(rm.down_proj)],
            report,
        )

    for i, (block, rblock) in enumerate(
        zip(model.blocks, reference.blocks)
    ):
        p = f"layers.{i}"
        attn_pairs(f"{p}.attn", block.attn, rblock.attn)
        m, rm = block.mlp, rblock.mlp
        if isinstance(m, (MoeMlp, DeepseekMoe)):
            for e, (ex, rex) in enumerate(zip(m.experts, rm.experts)):
                mlp_pairs(f"{p}.mlp.experts.{e}", ex, rex)
            if isinstance(m, DeepseekMoe):
                mlp_pairs(
                    f"{p}.mlp.shared_experts",
                    m.shared_experts, rm.shared_experts,
                )
        else:
            mlp_pairs(f"{p}.mlp", m, rm)
    if model.lm_head is not None and reference.lm_head is not None:
        _compare(
            "lm_head", model.lm_head, [_ref_w(reference.lm_head)],
            report,
        )
    return report


def summarize_report(
    report: Dict[str, Dict[str, float]],
) -> Dict[str, float]:
    """Aggregate per-layer fidelity: worst / mean relative RMS."""
    vals = [
        r["rel_rms"] for r in report.values() if "rel_rms" in r
    ]
    if not vals:
        return {"n_layers": 0}
    return {
        "n_layers": len(vals),
        "mean_rel_rms": float(np.mean(vals)),
        "worst_rel_rms": float(np.max(vals)),
    }
