"""Error-feedback weight quantization (GPTQ) for the runtime formats.

Rounds a weight matrix column by column; after each column the rounding
error — whitened by the Cholesky factor of the inverse input Hessian
``H = X^T X`` — is subtracted from the not-yet-quantized columns, so
correlated input directions absorb each other's rounding noise. This is
the standard GPTQ recurrence (Frantar et al., 2023) specialized to the
symmetric group-scaled int4/int8 layouts of
:mod:`vptq_tpu.layers.runtime`.

Runs ONCE on the host at ingestion time (numpy; Cholesky via LAPACK), so
the serving path is unchanged — the output is bit-compatible with the
RTN encoders (`packing.quantize_int4` / `_encode_int8`) and feeds the
same Pallas kernels.

Reference anchor: the reference ships no re-quantizer (its accuracy
lives in the offline VPTQ algorithm, out of scope per SURVEY.md), but
its accuracy discipline — fidelity measured against an exact oracle,
reference tests/test_quant_gemv.py:174-194 — is the bar this module
exists to meet for the dense formats.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["gptq_quantize", "group_spans", "output_error_ratio"]


def group_spans(
    in_features: int, group: int, block: Optional[int] = None
) -> List[Tuple[int, int]]:
    """Scale-group column spans [start, end) for a row of weights.

    ``block``: optional outer block width (the shard width of the
    blocked TP layout, parallel/tp.py) — groups never straddle a block
    boundary; the last group of each block may be short.
    """
    spans = []
    block = block or in_features
    for b0 in range(0, in_features, block):
        b1 = min(b0 + block, in_features)
        for g0 in range(b0, b1, group):
            spans.append((g0, min(g0 + group, b1)))
    return spans


def _bf16_rne(x: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


# (qmin, qmax, scale-base divisor, level offset) per bit width; int3
# is the asymmetric two's-complement range of the plane format
# (layers/runtime.py Int3Linear); int2 is the half-offset grid
# ``(q + 0.5) * s`` of the w2 plane format (packing.quantize_int2)
_BIT_RANGES = {
    2: (-2, 1, 1.5, 0.5),
    3: (-4, 3, 3.5, 0.0),
    4: (-7, 7, 7.0, 0.0),
    8: (-127, 127, 127.0, 0.0),
}


def _group_scale(
    w_group: np.ndarray, qmin: int, qmax: int, div: float,
    bf16_scales: bool, candidates: Sequence[float],
    offset: float = 0.0,
    col_weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-row scale for one column group of (updated) weights.

    Same MSE grid search as packing.quantize_int4 (absmax shrink
    factors, RTN round-trip error as the criterion — the error
    feedback downstream only improves on that choice). ``offset``:
    quantized levels are ``(q + offset) * s`` (the int2 half-offset
    grid). ``col_weights``: per-column error weights — the Hessian
    diagonal when calibration data exists, making the grid search
    salience-aware (clipping error on a high-activation column costs
    its true output energy, not its flat MSE; matters most at 2-bit
    where the grid clips aggressively).
    """
    absmax = np.abs(w_group).max(axis=1)
    base = np.where(absmax > 0, absmax / div, 1.0).astype(np.float32)
    rnd = _bf16_rne if bf16_scales else lambda v: v
    cw = (
        None
        if col_weights is None
        else col_weights[None, :].astype(np.float32)
    )

    def werr(dw2):
        return (dw2 if cw is None else dw2 * cw).sum(axis=1)

    scale = rnd(base)
    q = np.clip(
        np.round(w_group / scale[:, None] - offset), qmin, qmax
    )
    best = werr((w_group - (q + offset) * scale[:, None]) ** 2)
    for f in candidates[1:]:
        s = rnd(base * np.float32(f))
        qc = np.clip(
            np.round(w_group / s[:, None] - offset), qmin, qmax
        )
        err = werr((w_group - (qc + offset) * s[:, None]) ** 2)
        better = err < best
        best = np.where(better, err, best)
        scale = np.where(better, s, scale)
    return scale


def _cholesky_inv_upper_at(h: np.ndarray, dtype) -> np.ndarray:
    """Upper U with ``H^-1 = U^T U`` via the flipped UL factorization.

    ``H^-1 = U^T U`` means ``H = U^-1 U^-T`` — a UL decomposition of H.
    Flipping rows+cols turns it into a standard lower Cholesky:
    ``J H J = (J U^-1 J)(J U^-1 J)^T`` with ``J U^-1 J`` lower
    triangular. So: ``L = chol(JHJ)``, ``U = J L^-1 J``. One potrf +
    one trtri ≈ 2n^3/3 flops, vs the naive
    cho_factor + cho_solve(eye) + cholesky ≈ 3n^3 — and it never
    materializes H^-1. At in=11008 (7B down_proj) this is the
    difference between ~230 s (f64 naive) and ~20 s (f32 here) per
    site on a 4-core host.
    """
    from scipy import linalg
    from scipy.linalg import lapack

    hf = np.ascontiguousarray(h[::-1, ::-1].astype(dtype, copy=False))
    low = linalg.cholesky(hf, lower=True, check_finite=False)
    trtri = lapack.strtri if dtype == np.float32 else lapack.dtrtri
    linv, info = trtri(low, lower=1)
    if info != 0:
        raise np.linalg.LinAlgError(f"trtri failed (info={info})")
    u = np.ascontiguousarray(linv[::-1, ::-1])
    if not np.all(np.isfinite(u)):
        raise np.linalg.LinAlgError("non-finite factor")
    return u


def _cholesky_inv_upper(h: np.ndarray, damp: float) -> np.ndarray:
    """Upper Cholesky factor of H^-1 (dampened).

    f32 first (GPTQ-standard precision; ~3x faster LAPACK and half
    the transient memory — the factor is the scaling bottleneck at
    70B geometry, in=28672), escalating damping then f64 only if
    factorization fails.
    """
    h = np.asarray(h)
    idx = np.arange(h.shape[0])
    diag = np.asarray(h[idx, idx], np.float64)
    safe = np.where(diag <= 0, 1.0, diag)
    mean_d = float(safe.mean())

    def dampened(mult: float, dtype):
        hd = h.astype(dtype, copy=True)
        hd[idx, idx] = safe + mult * damp * mean_d
        return hd

    for mult, dtype in ((1.0, np.float32), (10.0, np.float32),
                        (1.0, np.float64), (100.0, np.float64)):
        try:
            return _cholesky_inv_upper_at(dampened(mult, dtype), dtype)
        except np.linalg.LinAlgError:
            continue
    raise np.linalg.LinAlgError(
        "Hessian not factorizable even with 100x damping"
    )


def gptq_quantize(
    w: np.ndarray,  # (out, in) f32 — exact weights
    hessian: Optional[np.ndarray],  # (in, in) — X^T X (f32/f64)
    *,
    bits: int = 4,
    group: int = 128,
    block: Optional[int] = None,
    damp: float = 0.01,
    scale_candidates: Optional[Sequence[float]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize ``w`` to symmetric group-scaled ints with error feedback.

    Returns ``(q, scales)``: ``q`` int8 of ``w.shape`` in
    ``[-qmax, qmax]`` and ``scales`` f32 of shape
    ``(out, n_groups)`` — directly consumable by
    :func:`vptq_tpu.layers.runtime.int4_from_q` /
    :func:`~vptq_tpu.layers.runtime.int8_from_q`.

    ``hessian=None`` degrades to plain RTN with the grid-searched
    scales (no feedback term exists without input correlations).
    ``bits=2``/``bits=3``/``bits=4`` store bf16-rounded scales (the
    Int2Linear / Int3Linear / Int4Linear layouts; int3 clips to the
    asymmetric [-4, 3] range; int2 uses the half-offset levels
    ``(q + 0.5) * s``); ``bits=8`` keeps f32 scales (Int8Linear).
    ``block``: blocked-TP shard width — groups are restarted at each
    block boundary (see :func:`group_spans`).
    """
    if bits not in _BIT_RANGES:
        raise ValueError(f"bits must be one of {set(_BIT_RANGES)}")
    qmin, qmax, div, offset = _BIT_RANGES[bits]
    if scale_candidates is None:
        scale_candidates = tuple(1.0 - 0.05 * i for i in range(8))
        if bits == 3:
            # the asymmetric [-4, 3] range needs GROW candidates too:
            # a positive-absmax group at base absmax/3.5 rounds its
            # extreme to 4 and clips — scale*1.15/1.3 encodes it
            # exactly (mirrors packing.quantize_int3's grid)
            scale_candidates = scale_candidates + (1.15, 1.3)
        elif bits == 2:
            # deep shrink ladder: 2-bit MSE favours clipping — the
            # SAME grid as the RTN oracle / native quantizer
            from vptq_tpu.ops.packing import INT2_SCALE_CANDIDATES

            scale_candidates = INT2_SCALE_CANDIDATES
    bf16_scales = bits != 8
    out_f, in_f = w.shape
    spans = group_spans(in_f, group, block)

    q = np.zeros((out_f, in_f), np.int8)
    scales = np.zeros((out_f, len(spans)), np.float32)

    if hessian is None:
        wf = w.astype(np.float32)
        for gi, (g0, g1) in enumerate(spans):
            s = _group_scale(
                wf[:, g0:g1], qmin, qmax, div, bf16_scales,
                scale_candidates, offset,
            )
            scales[:, gi] = s
            q[:, g0:g1] = np.clip(
                np.round(wf[:, g0:g1] / s[:, None] - offset),
                qmin, qmax,
            ).astype(np.int8)
        return q, scales

    u = _cholesky_inv_upper(np.asarray(hessian), damp)
    udiag = np.einsum("ii->i", u).astype(np.float32)
    u32 = u.astype(np.float32)

    wrk = w.astype(np.float32, copy=True)
    hdiag = np.asarray(
        np.einsum("ii->i", np.asarray(hessian)), np.float32
    )
    # dead inputs (never activated): quantize to zero, no feedback
    dead = hdiag <= 0
    if dead.any():
        wrk[:, dead] = 0.0

    for gi, (g0, g1) in enumerate(spans):
        s = _group_scale(
            wrk[:, g0:g1], qmin, qmax, div, bf16_scales,
            scale_candidates, offset, hdiag[g0:g1],
        )
        scales[:, gi] = s
        inv_s = 1.0 / s
        err_blk = np.empty((out_f, g1 - g0), np.float32)
        for j in range(g0, g1):
            wc = wrk[:, j]
            qc = np.clip(np.round(wc * inv_s - offset), qmin, qmax)
            q[:, j] = qc.astype(np.int8)
            err = (wc - (qc + offset) * s) / udiag[j]
            err_blk[:, j - g0] = err
            if j + 1 < g1:
                # in-group feedback (next columns of this group)
                wrk[:, j + 1: g1] -= np.outer(err, u32[j, j + 1: g1])
        if g1 < in_f:
            # batched feedback onto all later groups
            wrk[:, g1:] -= err_blk @ u32[g0:g1, g1:]
    return q, scales


def dequant_groups(
    q: np.ndarray,
    scales: np.ndarray,
    spans: List[Tuple[int, int]],
    offset: float = 0.0,
) -> np.ndarray:
    """Host dequant of (q, scales) over explicit group spans.

    ``offset``: levels are ``(q + offset) * s`` (0.5 for int2)."""
    w = q.astype(np.float32) + np.float32(offset)
    for gi, (g0, g1) in enumerate(spans):
        w[:, g0:g1] *= scales[:, gi: gi + 1]
    return w


def output_error_ratio(
    w: np.ndarray, w_hat: np.ndarray, hessian: Optional[np.ndarray]
) -> float:
    """Relative expected output error of the re-encode.

    ``E||(W - W_hat) x||^2 / E||W x||^2`` over the calibration input
    distribution: ``tr(dW H dW^T) / tr(W H W^T)``. This is the
    sensitivity measure driving mixed-precision format selection
    (calibrate.quantize_model_calibrated). With ``hessian=None`` it
    degrades to the plain relative squared weight RMS.
    """
    dw = (w_hat - w).astype(np.float32)
    wf = w.astype(np.float32)
    if hessian is None:
        num = float(np.sum(dw.astype(np.float64) ** 2))
        den = float(np.sum(wf.astype(np.float64) ** 2))
    else:
        # f32 GEMMs (4x the f64 throughput on this host; the ratio is
        # a format decision at ~1e-2 scale, far above sgemm noise)
        # with f64 reductions
        h = np.asarray(hessian, np.float32)
        num = float(np.einsum("ij,ij->", dw @ h, dw, dtype=np.float64))
        den = float(np.einsum("ij,ij->", wf @ h, wf, dtype=np.float64))
    return num / den if den > 0 else 0.0
