"""Calibration-driven model re-encode: GPTQ + mixed precision.

Walks the decoder block by block (the GPTQ protocol):

  1. run the block's forward EAGERLY on calibration activations with
     per-linear input recorders (``H += x^T x`` per quantization site),
  2. quantize the block's linears with error feedback against H
     (:func:`vptq_tpu.quant.gptq.gptq_quantize`),
  3. if a site's measured relative output error
     (:func:`~vptq_tpu.quant.gptq.output_error_ratio`) exceeds
     ``int8_threshold``, re-encode that site as int8 instead
     (sensitivity-driven mixed precision — the decision is a per-layer
     measurement, not a name-based table),
  4. re-run the block with the QUANTIZED weights so downstream blocks
     calibrate against the activations they will actually see.

Everything runs once on the host at ingestion; the output model uses
the standard Int4Linear/Int8Linear runtime layouts and kernels.

The capture step replaces each compressed linear with an exact f32
dense mirror and wraps one member of each shared-input site with a
recorder — all model forwards go through the existing
``models.llama`` code paths, so every architecture the loader supports
(GQA, MLA, MoE) calibrates without model-specific capture code.

MoE caveat: the dense all-experts calibration path feeds every token
to every expert, so expert Hessians are unweighted by routing
probability — an acceptable approximation (mis-weighting only
second-moment importance, not values).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.vqlinear import VQLinear
from vptq_tpu.quant.gptq import (
    dequant_groups,
    gptq_quantize,
    group_spans,
    output_error_ratio,
)

logger = logging.getLogger("vptq_tpu")

__all__ = [
    "synthetic_calibration_tokens",
    "quantize_model_calibrated",
]

# default int8 site budget for "int4-mixed" (ranking-pass mode): the
# top-sensitivity 3/8 of the sites goes int8 (~5.5 bits/weight
# average). Measured on the mid-size synthetic model
# (tests/test_calibrate.py, CPU f32): logit KL 0.0676 (pure int4 RTN)
# -> 0.0145 — within 2.9x of all-int8's — while keeping most of int4's
# decode-bandwidth win. Error concentrates in a few sites (typically
# early-block attention/down projections), which is why a modest
# measured budget buys most of the fidelity: the first 4 sites alone
# take KL to 0.0152; the next 2 to 0.0145.
MIXED_INT8_FRACTION = 0.375


def synthetic_calibration_tokens(
    vocab_size: int,
    n_tokens: int = 4096,
    seq_len: int = 512,
    seed: int = 0,
) -> np.ndarray:
    """(B, S) int32 random-token calibration batch.

    Used when no text corpus is available (e.g. the egress-blocked
    bench environment). Random tokens exercise the full embedding
    range; for production accuracy numbers pass real tokenized text
    (eval/ppl.py datasets) instead.
    """
    rng = np.random.default_rng(seed)
    seq_len = min(seq_len, n_tokens)
    batch = max(1, n_tokens // seq_len)
    return rng.integers(
        0, vocab_size, (batch, seq_len), dtype=np.int64
    ).astype(np.int32)


class _Hess:
    """Running input second moment for one quantization site.

    ``diag_only`` accumulates just the per-column sum of squares —
    O(tokens*in) instead of O(tokens*in^2) and an (in,) buffer
    instead of (in,in): the ranking pass reads only the diagonal.
    """

    def __init__(self, n: int, diag_only: bool = False):
        self.h = None if diag_only else np.zeros((n, n), np.float32)
        self.d = np.zeros((n,), np.float32) if diag_only else None
        self.count = 0

    # token-chunk size for the rank-k Hessian accumulation: bounds the
    # (chunk, in) f32 staging copy at ~128 MB even at DeepSeek's
    # in=18432 (the syrk peak is the (in,in) buffer itself, held once)
    CHUNK = 8192

    def update(self, x: jnp.ndarray):
        x2 = np.asarray(
            jax.device_get(x.reshape(-1, x.shape[-1])), np.float32
        )
        for c0 in range(0, x2.shape[0], self.CHUNK):
            xc = x2[c0: c0 + self.CHUNK]
            if self.d is not None:
                self.d += (xc * xc).sum(axis=0)
            else:
                self.h += xc.T @ xc
        self.count += x2.shape[0]

    @property
    def diag(self) -> np.ndarray:
        return self.d if self.d is not None else np.diag(self.h)


class _Rec:
    """Callable linear wrapper: record the input, then delegate."""

    def __init__(self, lin, hess: Optional[_Hess]):
        self.lin = lin
        self.hess = hess

    def __call__(self, x):
        if self.hess is not None:
            self.hess.update(x)
        return self.lin(x)


def _get(obj, path: str):
    for p in path.split("."):
        obj = obj[int(p)] if p.isdigit() else getattr(obj, p)
    return obj


def _set(obj, path: str, value):
    parts = path.split(".")

    def rec(o, i):
        p = parts[i]
        if i == len(parts) - 1:
            new = value
        else:
            child = o[int(p)] if p.isdigit() else getattr(o, p)
            new = rec(child, i + 1)
        if p.isdigit():
            lst = list(o)
            lst[int(p)] = new
            return tuple(lst)
        return o.replace(**{p: new})

    return rec(obj, 0)


def _mlp_slots(prefix: str, mlp, site_prefix: str):
    """(path, site) slots for an Mlp — fused or split projections."""
    slots = []
    if getattr(mlp, "gate_up_proj", None) is not None:
        slots.append((f"{prefix}.gate_up_proj", f"{site_prefix}gate_up"))
    else:
        slots.append((f"{prefix}.gate_proj", f"{site_prefix}gate_up"))
        slots.append((f"{prefix}.up_proj", f"{site_prefix}gate_up"))
    slots.append((f"{prefix}.down_proj", f"{site_prefix}down"))
    return slots


def _block_slots(block) -> List[Tuple[str, str]]:
    """Enumerate (dotted_path, site_name) linear slots of one block.

    Slots sharing a site name share their input tensor (q|k|v, gate|up)
    — they get one Hessian and one joint format decision (so fusion
    stays possible after mixed-precision selection).
    """
    from vptq_tpu.models.llama import DeepseekMoe, MlaAttention, MoeMlp

    slots: List[Tuple[str, str]] = []
    attn = block.attn
    if isinstance(attn, MlaAttention):
        # q/q_a and kv_a consume the SAME block input — one shared
        # site avoids accumulating the hidden-size^2 Hessian twice
        if attn.q_proj is not None:
            slots.append(("attn.q_proj", "attn_in"))
        else:
            slots.append(("attn.q_a_proj", "attn_in"))
            slots.append(("attn.q_b_proj", "q_b"))
        slots.append(("attn.kv_a_proj", "attn_in"))
        slots.append(("attn.o_proj", "o"))
    else:
        if attn.qkv_proj is not None:
            slots.append(("attn.qkv_proj", "qkv"))
        else:
            slots.append(("attn.q_proj", "qkv"))
            slots.append(("attn.k_proj", "qkv"))
            slots.append(("attn.v_proj", "qkv"))
        slots.append(("attn.o_proj", "o"))

    mlp = block.mlp
    if isinstance(mlp, MoeMlp):
        for e in range(len(mlp.experts)):
            slots.extend(
                _mlp_slots(f"mlp.experts.{e}", mlp.experts[e], f"e{e}.")
            )
    elif isinstance(mlp, DeepseekMoe):
        for e in range(len(mlp.experts)):
            slots.extend(
                _mlp_slots(f"mlp.experts.{e}", mlp.experts[e], f"e{e}.")
            )
        slots.extend(
            _mlp_slots(
                "mlp.shared_experts", mlp.shared_experts, "shared."
            )
        )
    else:
        slots.extend(_mlp_slots("mlp", mlp, ""))
    return [(p, s) for p, s in slots if _exists(block, p)]


def _exists(block, path: str) -> bool:
    try:
        return _get(block, path) is not None
    except AttributeError:
        return False


def _block_forward(i, block, x, cos, sin, cache, cfg):
    """One decoder block, mirroring the loop body of models.llama
    forward (llama.py forward) — used eagerly for capture/propagation."""
    from vptq_tpu.models.llama import (
        MlaAttention,
        _attention,
        _mla_attention,
        _mlp,
        rms_norm,
    )

    h = rms_norm(x, block.input_layernorm, cfg.rms_norm_eps)
    if isinstance(block.attn, MlaAttention):
        attn_out, cache = _mla_attention(
            i, block.attn, h, cos, sin, cache, cfg
        )
    else:
        attn_out, cache = _attention(
            i, block.attn, h, cos, sin, cache, cfg, fresh_prefill=True
        )
    x = x + attn_out
    h2 = rms_norm(x, block.post_attention_layernorm, cfg.rms_norm_eps)
    x = x + _mlp(block.mlp, h2)
    return x, cache


def _exact_f32(lin) -> np.ndarray:
    from vptq_tpu.layers.runtime import _exact_weight

    return _exact_weight(lin)


def _rtn_sensitivity(
    w: np.ndarray, diag_h: np.ndarray, bits: int = 4
) -> float:
    """Cheap per-layer sensitivity: diag-Hessian-weighted relative
    output error of the plain base-bits RTN re-encode. O(out*in) —
    used by the ranking pass of ``int8_fraction`` (no Cholesky, H
    discarded)."""
    group = 64 if bits == 2 else 128
    q, s = gptq_quantize(w, None, bits=bits, group=group)
    spans = group_spans(w.shape[1], group)
    dw = dequant_groups(q, s, spans, 0.5 if bits == 2 else 0.0) - w
    d = diag_h.astype(np.float64)
    num = float((dw.astype(np.float64) ** 2).sum(axis=0) @ d)
    den = float((w.astype(np.float64) ** 2).sum(axis=0) @ d)
    return num / den if den > 0 else 0.0


def _gptq_layer(bits, w, bias, hess, damp):
    """GPTQ-encode ONE weight matrix; returns (layer, w_hat)."""
    from vptq_tpu.layers.runtime import (
        int2_from_q,
        int3_from_q,
        int4_from_q,
        int8_from_q,
        pick_group,
    )

    in_f = w.shape[1]
    if bits in (3, 4):
        pad = (-in_f) % 128
        group = 128
    elif bits == 2:
        pad = (-in_f) % 64
        group = 64
    else:
        group = pick_group(in_f)
        pad = (-in_f) % group
    wp = np.pad(w, ((0, 0), (0, pad))) if pad else w
    hp = hess
    if hess is not None and pad:
        hp = np.zeros((in_f + pad, in_f + pad), hess.dtype)
        hp[:in_f, :in_f] = hess
    q, scales = gptq_quantize(
        wp, hp, bits=bits, group=group, damp=damp
    )
    spans = group_spans(wp.shape[1], group)
    offset = 0.5 if bits == 2 else 0.0
    w_hat = dequant_groups(q, scales, spans, offset)[:, :in_f]
    if bits == 2:
        lin = int2_from_q(q, scales, bias)
    elif bits == 3:
        lin = int3_from_q(q, scales, bias)
    elif bits == 4:
        lin = int4_from_q(q, scales, bias)
    else:
        lin = int8_from_q(q, scales, bias)
    return lin, w_hat


def _gptq_layer_blocked(bits, w, bias, hess, damp, shards):
    """Blocked shard_map-TP encode with PER-SHARD GPTQ.

    Each contiguous column shard gets its own error-feedback pass
    against the matching diagonal block of H (cross-shard feedback is
    inherently unavailable — shards quantize independently by layout
    contract, parallel/tp.py), padded exactly like the RTN blocked
    encoders so ``tp_place_block(reencode_rows=False)`` slices it
    directly — the calibrated quality survives TP placement instead
    of being re-quantized RTN from its own dequant.
    """
    from vptq_tpu.layers.runtime import (
        Int2Linear,
        Int3Linear,
        Int4Linear,
        Int8Linear,
        int2_from_q,
        int3_from_q,
        int4_from_q,
        int8_from_q,
        pick_group,
    )

    pad = (-w.shape[1]) % shards
    wp = np.pad(w, ((0, 0), (0, pad))) if pad else w
    hp = hess
    if hess is not None and pad:
        n = w.shape[1]
        hp = np.zeros((n + pad, n + pad), hess.dtype)
        hp[:n, :n] = hess
    blk = wp.shape[1] // shards
    parts, hats = [], []
    for si in range(shards):
        ws = wp[:, si * blk: (si + 1) * blk]
        hs = (
            None
            if hp is None
            else hp[si * blk: (si + 1) * blk,
                    si * blk: (si + 1) * blk]
        )
        if bits == 4:
            shard_pad = 512 if blk >= 512 else 256
            group = 128
        elif bits == 3:
            shard_pad = 1024
            group = 128
        elif bits == 2:
            shard_pad = 1024  # W2_BLOCK
            group = 64
        else:
            group = pick_group(blk)
            shard_pad = group
        spad = (-blk) % shard_pad
        wsp = np.pad(ws, ((0, 0), (0, spad))) if spad else ws
        hsp = hs
        if hs is not None and spad:
            hsp = np.zeros((blk + spad, blk + spad), hs.dtype)
            hsp[:blk, :blk] = hs
        q, scales = gptq_quantize(
            wsp, hsp, bits=bits, group=group, damp=damp
        )
        hats.append(
            dequant_groups(
                q, scales, group_spans(wsp.shape[1], group),
                0.5 if bits == 2 else 0.0,
            )[:, :blk]
        )
        if bits == 2:
            parts.append(int2_from_q(q, scales, None, pad_to=shard_pad))
        elif bits == 3:
            parts.append(int3_from_q(q, scales, None, pad_to=shard_pad))
        elif bits == 4:
            parts.append(int4_from_q(q, scales, None, pad_to=shard_pad))
        else:
            parts.append(int8_from_q(q, scales, None))
    w_hat = np.concatenate(hats, axis=1)[:, : w.shape[1]]
    if bits == 2:
        lin = Int2Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=1),
            bias=bias,
        )
    elif bits == 3:
        lin = Int3Linear(
            wq2=np.concatenate([p.wq2 for p in parts], axis=1),
            wq1=np.concatenate([p.wq1 for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=1),
            bias=bias,
        )
    elif bits == 4:
        lin = Int4Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=0),
            bias=bias,
        )
    else:
        lin = Int8Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=0),
            bias=bias,
        )
    return lin, w_hat


def _select_cols(
    weights: List[np.ndarray],
    hess: Optional[np.ndarray],
    col_frac: float,
    shards: int = 1,
    base_bits: Optional[int] = None,
) -> np.ndarray:
    """Top-sensitivity input COLUMNS of one site (joint over members,
    so q|k|v share one selection and stay fusable).

    Column sensitivity = ``diag(H)[c] * sum_r w[r,c]^2`` — the
    first-order output energy a column carries (input second moment x
    weight energy). A measured alternative — RTN quantization-error
    mass under the base grid — scored WORSE on the planted-outlier
    eval (int2-mixed KL 0.093 energy vs 0.106 error-mass): energy
    also captures the scale re-tightening the extraction buys for the
    REMAINING columns of each polluted group. Per-column (not
    per-128-group) granularity is the point: real-model salient
    channels are SCATTERED, so a handful of them pollutes many scale
    groups; pulling the individual columns out both carries them
    exactly in int8 and lets every polluted group re-tighten its
    absmax scale (the encode zeroes them before picking scales).
    Floor of 128 columns keeps the int8 side matmul kernel-shaped.

    ``shards > 1`` (blocked shard_map TP, row-parallel sites): the
    SAME count is selected inside every contiguous column shard, so
    each device's local gather + int8 side matmul has a static
    shard-uniform shape. Returned columns are global, shard-major.
    """
    del base_bits  # see docstring: energy beat error-mass, measured
    in_f = weights[0].shape[1]
    col_e = np.zeros(in_f, np.float64)
    for w in weights:
        col_e += (w.astype(np.float64) ** 2).sum(axis=0)
    if hess is not None:
        col_e *= np.asarray(
            np.einsum("ii->i", np.asarray(hess)), np.float64
        )[:in_f]
    if in_f % shards:
        raise ValueError(
            f"in_features {in_f} does not divide {shards} TP shards"
        )
    blk = in_f // shards
    k = max(128, int(round(blk * col_frac)))
    k = ((k + 127) // 128) * 128  # 128-multiple: pad-free int8 side
    # at group=128
    if blk < 128:
        # tiny geometry (tests/toys): every column goes int8, the
        # side encode zero-pads its scale group
        k = blk
    else:
        k = min(k, blk - blk % 128 if blk % 128 else blk)
    cols = np.concatenate([
        s * blk
        + np.sort(np.argsort(col_e[s * blk: (s + 1) * blk])[::-1][:k])
        for s in range(shards)
    ])
    return cols.astype(np.int32)


def _gptq_layer_mixed(base_bits, w, bias, hess, damp, cols, shards=1):
    """Column-block mixed encode: int8 on ``cols``, int3/int2 planes
    elsewhere.

    The selected columns are zeroed (weights AND Hessian rows/cols)
    for the base-bits pass — they are dead inputs there. The int8
    side matrix then carries the RESIDUAL ``w[:, cols] - w_hat[:,
    cols]``: for int3 the zeroed plane positions dequant to exactly 0
    (residual == w), but the int2 half-offset grid cannot represent
    zero — its dead columns dequant to ±0.5*s, and the residual
    encode absorbs that leftover exactly, keeping the runtime
    ``y = base(x) + int8(x[cols])`` identity.

    ``shards > 1`` (blocked shard_map TP): ``cols`` holds the same
    count per contiguous column shard (see :func:`_select_cols`); the
    int3 planes encode blocked, the int8 side matrix encodes per
    shard (its scale groups never straddle a shard boundary), and
    ``col_idx`` stores SHARD-LOCAL column ids — inside ``shard_map``
    each device gathers from its local activation slice. The blocked
    output is a placement-only artifact (parallel/tp.py
    ``_row_parallel(reencode=False)``), exactly like the blocked
    int3/int4/int8 encodings.
    """
    from vptq_tpu.layers.runtime import (
        Int2MixedLinear,
        Int3MixedLinear,
        int8_from_q,
    )

    wb = w.copy()
    wb[:, cols] = 0.0
    hb = hess
    if hess is not None:
        hb = np.asarray(hess).copy()
        hb[cols, :] = 0.0
        hb[:, cols] = 0.0
    if shards > 1:
        lin_b, w_hat = _gptq_layer_blocked(
            base_bits, wb, None, hb, damp, shards
        )
    else:
        lin_b, w_hat = _gptq_layer(base_bits, wb, None, hb, damp)

    # per-shard side encode at group=128 (the per-shard column count
    # is a 128-multiple by construction for real geometries — no
    # padding, and no scale group straddles a shard boundary; tiny
    # toy widths below 128 zero-pad their single group)
    k_s = len(cols) // shards
    blk = w.shape[1] // shards
    q8s, s8s, hat8s = [], [], []
    for s in range(shards):
        cs = cols[s * k_s: (s + 1) * k_s]
        w8 = np.ascontiguousarray(w[:, cs] - w_hat[:, cs])
        h8 = (
            None
            if hess is None
            else np.ascontiguousarray(hess[np.ix_(cs, cs)])
        )
        pad = (-k_s) % 128
        if pad:
            w8 = np.pad(w8, ((0, 0), (0, pad)))
            if h8 is not None:
                h8p = np.zeros((k_s + pad, k_s + pad), h8.dtype)
                h8p[:k_s, :k_s] = h8
                h8 = h8p
        q8, s8 = gptq_quantize(w8, h8, bits=8, group=128, damp=damp)
        q8s.append(q8)
        s8s.append(s8)
        hat8s.append(
            dequant_groups(
                q8, s8, group_spans(w8.shape[1], 128)
            )[:, :k_s]
        )
    lin8 = int8_from_q(
        np.concatenate(q8s, axis=1), np.concatenate(s8s, axis=1), None
    )

    w_hat[:, cols] = w_hat[:, cols] + np.concatenate(hat8s, axis=1)
    col_idx = np.asarray(cols, np.int64)
    if shards > 1:
        # shard-local ids: device d's slice of col_idx indexes its
        # local x block
        col_idx = col_idx - np.repeat(
            np.arange(shards, dtype=np.int64) * blk, k_s
        )
    cls = Int2MixedLinear if base_bits == 2 else Int3MixedLinear
    kw = {("int2" if base_bits == 2 else "int3"): lin_b}
    lin = cls(
        int8=lin8,
        col_idx=jnp.asarray(col_idx.astype(np.int32)), bias=bias,
        **kw,
    )
    return lin, w_hat


def _quantize_site(
    members: List[Tuple[str, VQLinear]],
    hess: Optional[np.ndarray],
    fmt: str,
    int8_threshold: Optional[float],
    damp: float,
    force_int8: bool = False,
    row_shards: int = 1,
    col_frac: Optional[float] = None,
):
    """GPTQ-encode all linears of one site; returns
    ([(path, new_lin)], site_report). ``row_shards > 1`` produces the
    blocked shard_map-TP layout (per-shard GPTQ)."""
    weights = [(_p, _exact_f32(lin), lin.bias) for _p, lin in members]

    # The H-weighted output-error ratio costs an (out, in) x (in, in)
    # GEMM per member — at 7B geometry that dwarfs GPTQ itself. It is
    # only a DECISION input on the threshold path; with a ranking-pass
    # budget (int8_threshold=None) the report gets the cheap
    # O(out*in) weight-RMS ratio instead.
    err_hess = hess if int8_threshold is not None else None

    if col_frac is not None:
        # column-block mixed int3/int2: one joint selection per site
        # so fusion survives; row-parallel sites under TP select and
        # encode per shard (shard-local col_idx, blocked planes)
        base_bits = 2 if fmt == "int2-mixed" else 3
        cols = _select_cols(
            [w for _p, w, _b in weights], hess, col_frac,
            shards=row_shards, base_bits=base_bits,
        )
        out, errs = [], []
        for path, w, bias in weights:
            lin, w_hat = _gptq_layer_mixed(
                base_bits, w, bias, hess, damp, cols,
                shards=row_shards,
            )
            errs.append(output_error_ratio(w, w_hat, err_hess))
            out.append((path, lin))
        return out, {
            "format": fmt,
            "err_ratio": max(errs),
            "int8_cols": int(len(cols)),
        }

    def encode(bits: int):
        out = []
        errs = []
        for path, w, bias in weights:
            if row_shards > 1:
                lin, w_hat = _gptq_layer_blocked(
                    bits, w, bias, hess, damp, row_shards
                )
            else:
                lin, w_hat = _gptq_layer(bits, w, bias, hess, damp)
            errs.append(output_error_ratio(w, w_hat, err_hess))
            out.append((path, lin))
        return out, errs

    base_bits = {
        "int8": 8, "int3": 3, "int3-mixed": 3, "int2": 2,
        "int2-mixed": 2,
    }.get(fmt, 4)
    target_bits = 8 if force_int8 else base_bits
    encoded, errs = encode(target_bits)
    site_fmt = f"int{target_bits}"
    err_base = max(errs) if target_bits != 8 else None
    if (
        target_bits != 8
        and int8_threshold is not None
        and err_base > int8_threshold
    ):
        encoded, errs = encode(8)
        site_fmt = "int8"
    rep = {"format": site_fmt, "err_ratio": max(errs)}
    if err_base is not None:
        rep[f"err_ratio_int{base_bits}"] = err_base
    return encoded, rep


def _site_map(block) -> Dict[str, List[str]]:
    """Slot paths grouped into shared-input sites, in slot order."""
    sites: Dict[str, List[str]] = {}
    for path, site in _block_slots(block):
        sites.setdefault(site, []).append(path)
    return sites


def _capture_block(
    i, block, sites, x, cos, sin, cache, cfg, diag_only: bool = False
) -> Tuple[jnp.ndarray, object, Dict[str, _Hess]]:
    """Run one block eagerly with exact f32 dense mirrors and one
    input recorder per site that has a compressed member. Returns
    (x_next, cache, hessians)."""
    hessians: Dict[str, _Hess] = {}
    cap = block
    for site, paths in sites.items():
        vq = [p for p in paths if isinstance(_get(block, p), VQLinear)]
        rec_h = None
        if vq:
            in_f = _get(block, vq[0]).cfg.in_features
            rec_h = hessians[site] = _Hess(in_f, diag_only=diag_only)
        for j, p in enumerate(paths):
            lin = _get(block, p)
            if isinstance(lin, VQLinear):
                lin = DenseLinear(
                    weight=jnp.asarray(_exact_f32(lin)),
                    bias=lin.bias,
                )
            cap = _set(cap, p, _Rec(lin, rec_h if j == 0 else None))
    x, cache = _block_forward(i, cap, x, cos, sin, cache, cfg)
    return x, cache, hessians


# sites whose linears are ROW-parallel under shard_map TP (the in
# axis shards; parallel/tp.py): attention output and the dense /
# shared-expert down projections. Routed-expert sites ("e{k}.down")
# are expert-sharded whole and stay unblocked.
_ROW_PARALLEL_SITES = ("o", "down", "shared.down")


def quantize_model_calibrated(
    model,
    tokens: Optional[np.ndarray] = None,
    fmt: str = "int4",
    *,
    int8_threshold: Optional[float] = None,
    int8_fraction: Optional[float] = None,
    damp: float = 0.01,
    fuse: bool = True,
    tp_shards: int = 1,
    upload: bool = True,
    resume_dir: Optional[str] = None,
    site_workers: int = 2,
) -> Tuple[object, Dict[str, dict]]:
    """Calibrated re-encode of a codebook-format model.

    Args:
        model: a :class:`~vptq_tpu.models.llama.Model` loaded with
            ``runtime_format="codebook"`` and ``fuse=False`` (exact).
        tokens: (B, S) int32 calibration token batch; defaults to
            4096 synthetic tokens
            (:func:`synthetic_calibration_tokens`).
        fmt: "int4" (pure, GPTQ) or "int4-mixed" (GPTQ + per-site
            int8 for the measured-most-sensitive sites) or "int8".
        int8_threshold: measured output-error ratio above which an
            int4 site is re-encoded int8.
        int8_fraction: keep this fraction of sites int8, chosen by a
            RANKING pass (per-site diag-H-weighted RTN sensitivity
            over the whole model, then a quantile cut) — predictable
            bit budget, unlike the threshold. Defaults to
            ``MIXED_INT8_FRACTION`` for fmt="int4-mixed" when neither
            knob is given. Costs one extra capture pass.
        fuse: fuse q|k|v / gate|up and stack MoE experts afterwards
            (runtime.fuse_model).
        tp_shards: encode row-parallel sites in the BLOCKED shard_map
            TP layout with per-shard GPTQ, so
            ``tp_place_block(reencode_rows=False)`` places the
            calibrated encoding directly (no lossy re-quantization).
        upload: device-put the result (False leaves host arrays for a
            mesh placement step).

    Returns:
        (quantized Model on the default device, per-site report dict
        with an extra ``"summary"`` entry).
    """
    from vptq_tpu.models.llama import (
        init_cache,
        rope_cos_sin,
        rope_frequencies,
    )

    if fmt not in (
        "int4", "int4-mixed", "int3", "int3-mixed", "int2",
        "int2-mixed", "int8",
    ):
        raise ValueError(f"unsupported calibrated format {fmt!r}")
    col_frac = None
    if fmt in ("int3-mixed", "int2-mixed"):
        # column-block mixing (the sub-4-bit fidelity path): the
        # int8_fraction knob is the COLUMN-group fraction here. Under
        # blocked shard_map TP, row-parallel sites select the same
        # column count per shard and store shard-local ids (see
        # _gptq_layer_mixed).
        from vptq_tpu.layers.runtime import (
            INT2_MIXED_COL_FRACTION,
            INT3_MIXED_COL_FRACTION,
        )

        if int8_threshold is not None:
            # the per-site threshold knob has no meaning under
            # per-COLUMN mixing — fail loudly instead of silently
            # ignoring it (the format's semantics changed in r4)
            raise ValueError(
                f"int8_threshold is a site-level knob; {fmt} mixes "
                "per column — pass int8_fraction (the column "
                "fraction) instead"
            )
        col_frac = (
            int8_fraction
            if int8_fraction is not None
            else (
                INT2_MIXED_COL_FRACTION
                if fmt == "int2-mixed"
                else INT3_MIXED_COL_FRACTION
            )
        )
        int8_fraction = None  # no site-level ranking pass
    elif (
        fmt in ("int4-mixed", "int3-mixed")
        and int8_threshold is None
        and int8_fraction is None
    ):
        int8_fraction = MIXED_INT8_FRACTION

    cfg = model.cfg
    if tokens is None:
        tokens = synthetic_calibration_tokens(cfg.vocab_size)
    tokens = jnp.asarray(np.asarray(tokens), jnp.int32)
    batch, seq = tokens.shape

    def fresh_inputs():
        x = model.embed_tokens[tokens].astype(jnp.float32)
        positions = jnp.broadcast_to(
            jnp.arange(seq, dtype=jnp.int32)[None, :], (batch, seq)
        )
        inv_freq, rope_scale = rope_frequencies(cfg)
        cos, sin = rope_cos_sin(positions, inv_freq, rope_scale)
        cache = init_cache(cfg, batch, seq + 8, jnp.float32)
        return x, cos, sin, cache

    report: Dict[str, dict] = {}

    import time as _time

    t_start = _time.time()

    # ---- interruption resilience (VERDICT r4 item 6): with
    # resume_dir, each completed block's quantized layers and the
    # propagated activation state are checkpointed — kill -9 at block
    # N restarts at block N instead of block 0 (the 7B calibration is
    # ~2.8 h on this host; 70B projects to a working day). Only ``x``
    # needs saving between blocks: capture forwards run fresh-prefill
    # attention, so earlier layers' KV slots are never read again.
    import os as _os
    import pickle as _pickle

    manifest = {"phase": "rank", "next_block": 0, "sens": {}}
    if resume_dir is not None:
        _os.makedirs(resume_dir, exist_ok=True)
        mpath = _os.path.join(resume_dir, "manifest.json")
        if _os.path.exists(mpath):
            import json as _json

            with open(mpath) as f:
                manifest = _json.load(f)
            logger.info(
                "resuming calibration: phase=%s block=%d",
                manifest["phase"], manifest["next_block"],
            )

    def _save_manifest(phase, next_block, x_arr, sens=None):
        if resume_dir is None:
            return
        import json as _json

        # state first, ATOMICALLY (tmp + replace): a kill mid-write
        # must not tear the pickle the still-valid manifest points at
        stmp = _os.path.join(resume_dir, "state.pkl.tmp")
        with open(stmp, "wb") as f:
            _pickle.dump(np.asarray(jax.device_get(x_arr)), f)
        _os.replace(stmp, _os.path.join(resume_dir, "state.pkl"))
        tmp = _os.path.join(resume_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "phase": phase,
                    "next_block": next_block,
                    "sens": sens if sens is not None else {},
                },
                f,
            )
        _os.replace(
            tmp, _os.path.join(resume_dir, "manifest.json")
        )

    def _load_x():
        with open(
            _os.path.join(resume_dir, "state.pkl"), "rb"
        ) as f:
            return jnp.asarray(_pickle.load(f))

    # ---- ranking pass: measured per-site sensitivity -> int8 set ----
    forced_int8: set = set()
    if int8_fraction is not None and fmt != "int8":
        x, cos, sin, cache = fresh_inputs()
        sens: Dict[str, float] = {}
        rank_start = 0
        if resume_dir is not None and manifest["phase"] == "rank":
            rank_start = manifest["next_block"]
            sens = dict(manifest.get("sens", {}))
            if rank_start > 0:
                x = _load_x()
        elif resume_dir is not None:
            # ranking already finished in the interrupted run
            rank_start = len(model.blocks)
            sens = dict(manifest.get("sens", {}))
        for i, block in enumerate(model.blocks):
            if i < rank_start:
                continue
            t_blk = _time.time()
            sites = _site_map(block)
            x, cache, hessians = _capture_block(
                i, block, sites, x, cos, sin, cache, cfg,
                diag_only=True,
            )
            for site, h in hessians.items():
                vq = [
                    _get(block, p)
                    for p in sites[site]
                    if isinstance(_get(block, p), VQLinear)
                ]
                diag_h = h.diag
                sens[f"layers.{i}.{site}"] = max(
                    _rtn_sensitivity(
                        _exact_f32(lin), diag_h,
                        bits={"int3": 3, "int2": 2}.get(
                            fmt.split("-")[0], 4
                        ),
                    )
                    for lin in vq
                )
            done, total = i + 1, len(model.blocks)
            eta = (_time.time() - t_start) / done * (total - done)
            logger.info(
                "ranking pass block %d/%d (%.1fs, ETA %.0fs)",
                done, total, _time.time() - t_blk, eta,
            )
            _save_manifest("rank", i + 1, x, sens)
        # carry the completed ranking into the in-memory manifest so
        # MAIN-phase checkpoints persist it (a resumed run rebuilds
        # forced_int8 from manifest sens — losing it would silently
        # drop the whole int8 site budget)
        manifest["sens"] = dict(sens)
        n8 = int(round(len(sens) * int8_fraction))
        ranked = sorted(sens, key=sens.get, reverse=True)
        forced_int8 = set(ranked[:n8])
        for k, v in sens.items():
            report[k] = {"sensitivity": v}
        logger.info(
            "ranking pass: %d/%d sites -> int8 (cut %.3g)",
            n8, len(sens), sens[ranked[n8 - 1]] if n8 else 0.0,
        )

    # ---- main pass: capture + GPTQ + propagate quantized stream ----
    from concurrent.futures import ThreadPoolExecutor

    t_main = _time.time()
    x, cos, sin, cache = fresh_inputs()
    new_blocks = []
    main_start = 0
    if resume_dir is not None and manifest["phase"] == "main":
        main_start = manifest["next_block"]
        if main_start > 0:
            x = _load_x()
            for bi in range(main_start):
                with open(
                    _os.path.join(resume_dir, f"block_{bi:04d}.pkl"),
                    "rb",
                ) as f:
                    qb, rep_b = _pickle.load(f)
                new_blocks.append(qb)
                for k, v in rep_b.items():
                    report.setdefault(k, {}).update(v)
    for i, block in enumerate(model.blocks):
        if i < main_start:
            continue
        t_blk = _time.time()
        sites = _site_map(block)
        x_cap, cache, hessians = _capture_block(
            i, block, sites, x, cos, sin, cache, cfg
        )

        # quantize each site (joint format decision per site) — sites
        # are independent given their Hessians, so they encode in a
        # small thread pool (the heavy Cholesky/GEMM work is in BLAS/
        # LAPACK, which release the GIL; 2 workers overlap one site's
        # Python-loop overhead with another's factorization)
        qblock = block
        work = []
        for site, paths in sites.items():
            members = [
                (p, _get(block, p))
                for p in paths
                if isinstance(_get(block, p), VQLinear)
            ]
            if not members:
                continue
            key = f"layers.{i}.{site}"
            h = hessians[site]
            work.append((key, site, members, h))

        def encode_site(item):
            key, site, members, h = item
            return key, _quantize_site(
                members,
                h.h if h.count else None,
                fmt,
                int8_threshold,
                damp,
                force_int8=key in forced_int8,
                row_shards=(
                    tp_shards
                    if tp_shards > 1 and site in _ROW_PARALLEL_SITES
                    else 1
                ),
                col_frac=col_frac,
            )

        if site_workers > 1 and len(work) > 1:
            with ThreadPoolExecutor(site_workers) as pool:
                results = list(pool.map(encode_site, work))
        else:
            results = [encode_site(w) for w in work]

        rep_block: Dict[str, dict] = {}
        for key, (encoded, site_rep) in results:
            for path, new_lin in encoded:
                qblock = _set(qblock, path, new_lin)
            report.setdefault(key, {}).update(site_rep)
            rep_block.setdefault(key, {}).update(site_rep)
        any_quantized = bool(results)

        if any_quantized:
            # propagate the QUANTIZED activations to later blocks
            x, cache = _block_forward(
                i, qblock, x, cos, sin, cache, cfg
            )
        else:
            x = x_cap
        new_blocks.append(qblock)
        if resume_dir is not None:
            with open(
                _os.path.join(resume_dir, f"block_{i:04d}.pkl"), "wb"
            ) as f:
                _pickle.dump(
                    (jax.tree.map(
                        lambda a: np.asarray(jax.device_get(a))
                        if hasattr(a, "dtype") else a,
                        qblock,
                    ), rep_block),
                    f,
                )
            _save_manifest(
                "main", i + 1, x, manifest.get("sens", {})
            )
        done, total = i + 1, len(model.blocks)
        eta = (_time.time() - t_main) / done * (total - done)
        logger.info(
            "calibrated block %d/%d (%.1fs, ETA %.0fs): %s",
            done,
            total,
            _time.time() - t_blk,
            eta,
            {
                k.split(".")[-1]: v["format"]
                for k, v in report.items()
                if k.startswith(f"layers.{i}.") and "format" in v
            },
        )

    from vptq_tpu.models.llama import Model

    out = Model(
        embed_tokens=model.embed_tokens,
        blocks=tuple(new_blocks),
        norm=model.norm,
        lm_head=model.lm_head,
        cfg=cfg,
    )
    if fuse:
        from vptq_tpu.layers.runtime import fuse_model

        out = fuse_model(out)
    if upload:
        out = jax.tree.map(jnp.asarray, out)

    counts = {}
    for r in report.values():
        f = r.get("format")
        if f:
            counts[f] = counts.get(f, 0) + 1
    report["summary"] = {
        "sites": sum(counts.values()),
        "int2_sites": counts.get("int2", 0),
        "int2_mixed_sites": counts.get("int2-mixed", 0),
        "int3_sites": counts.get("int3", 0),
        "int3_mixed_sites": counts.get("int3-mixed", 0),
        "int4_sites": counts.get("int4", 0),
        "int8_sites": counts.get("int8", 0),
        "calib_tokens": int(batch * seq),
        "wall_s": round(_time.time() - t_start, 1),
    }
    return out, report
