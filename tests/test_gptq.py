"""Unit tests for the GPTQ error-feedback encoder (quant/gptq.py)."""

import numpy as np
import pytest

from vptq_tpu.ops.packing import quantize_int4
from vptq_tpu.quant.gptq import (
    dequant_groups,
    gptq_quantize,
    group_spans,
    output_error_ratio,
)


def _correlated_inputs(in_f, n, rank_frac=4, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, in_f // rank_frac)).astype(np.float32)
    proj = rng.standard_normal((in_f // rank_frac, in_f)).astype(
        np.float32
    )
    x = z @ proj + 0.1 * rng.standard_normal((n, in_f)).astype(
        np.float32
    )
    return x


def test_group_spans():
    assert group_spans(512, 128) == [
        (0, 128), (128, 256), (256, 384), (384, 512),
    ]
    # blocked-TP layout: groups restart at each shard boundary and the
    # last group of a block may be short
    assert group_spans(640, 128, block=320) == [
        (0, 128), (128, 256), (256, 320),
        (320, 448), (448, 576), (576, 640),
    ]


def test_identity_hessian_matches_rtn():
    """With uncorrelated inputs there is no feedback direction — GPTQ
    must reduce EXACTLY to the RTN encoder (same grid-searched
    scales, same codes), so the calibrated path is a strict
    generalization of packing.quantize_int4."""
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((128, 512)) * 0.02).astype(np.float32)
    q_rtn, s_rtn = quantize_int4(w)

    q_eye, s_eye = gptq_quantize(w, np.eye(512), bits=4)
    np.testing.assert_array_equal(q_eye, q_rtn)
    np.testing.assert_allclose(
        s_eye, s_rtn.reshape(s_eye.shape)
    )

    q_none, s_none = gptq_quantize(w, None, bits=4)
    np.testing.assert_array_equal(q_none, q_rtn)


def test_error_feedback_beats_rtn_on_correlated_inputs():
    """The point of GPTQ: on correlated activations the expected
    output error tr(dW H dW^T) drops well below RTN's (here >=3x)."""
    out_f, in_f, n = 256, 512, 2048
    x = _correlated_inputs(in_f, n)
    h = (x.T @ x).astype(np.float64)
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)

    q_rtn, s_rtn = quantize_int4(w)
    w_rtn = (
        q_rtn.reshape(out_f, -1, 128).astype(np.float32)
        * s_rtn[:, :, None]
    ).reshape(out_f, in_f)
    e_rtn = output_error_ratio(w, w_rtn, h)

    q, s = gptq_quantize(w, h, bits=4)
    w_hat = dequant_groups(q, s, group_spans(in_f, 128))
    e_gptq = output_error_ratio(w, w_hat, h)

    assert e_gptq < e_rtn / 3.0, (e_gptq, e_rtn)
    # codes stay in the int4 runtime range
    assert q.min() >= -7 and q.max() <= 7


def test_int8_bits_and_dead_columns():
    out_f, in_f = 64, 512
    x = _correlated_inputs(in_f, 1024, seed=5)
    x[:, 100] = 0.0  # a dead input column
    h = (x.T @ x).astype(np.float64)
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)

    q, s = gptq_quantize(w, h, bits=8, group=256)
    assert q.dtype == np.int8 and s.shape == (out_f, 2)
    w_hat = dequant_groups(q, s, group_spans(in_f, 256))
    # int8 with feedback: tiny output error
    assert output_error_ratio(w, w_hat, h) < 1e-4
    # dead column quantizes to zero (no spurious feedback)
    assert np.all(q[:, 100] == 0)


def test_from_q_roundtrip_matches_runtime_layout():
    """int4_from_q / int8_from_q produce layers whose materialized
    weights equal the encoder's dequant — the calibrated encoder and
    the runtime kernels agree on the layout contract."""
    from vptq_tpu.eval.diagnostics import runtime_weight
    from vptq_tpu.layers.runtime import int4_from_q, int8_from_q

    rng = np.random.default_rng(7)
    w = (rng.standard_normal((96, 384)) * 0.02).astype(np.float32)
    h = None

    q, s = gptq_quantize(w, h, bits=4)
    lin4 = int4_from_q(q, s)
    got = runtime_weight(lin4)[:, :384]
    np.testing.assert_allclose(
        got, dequant_groups(q, s, group_spans(384, 128)), atol=1e-6
    )

    q8, s8 = gptq_quantize(
        np.pad(w, ((0, 0), (0, 128))), h, bits=8, group=512
    )
    lin8 = int8_from_q(q8, s8)
    got8 = runtime_weight(lin8)
    np.testing.assert_allclose(
        got8, dequant_groups(q8, s8, group_spans(512, 512)), atol=1e-6
    )


def test_int3_identity_matches_rtn_grid():
    """bits=3 must use quantize_int3's full grid — including the
    GROW candidates (1.15/1.3) the asymmetric [-4,3] range needs for
    positive-absmax groups (review r3 finding)."""
    from vptq_tpu.ops.packing import quantize_int3

    rng = np.random.default_rng(11)
    w = (rng.standard_normal((64, 512)) * 0.02).astype(np.float32)
    # force positive-dominant groups: abs-max is a positive weight
    w[:, ::7] = np.abs(w[:, ::7]) * 3.0
    q_rtn, s_rtn = quantize_int3(w)
    q, sc = gptq_quantize(w, None, bits=3)
    np.testing.assert_array_equal(q, q_rtn)
    np.testing.assert_allclose(sc, s_rtn.reshape(sc.shape))


@pytest.mark.slow
def test_hessian_path_scales_to_r1_geometry():
    """The calibration scaling axis at DeepSeek-R1's down_proj input
    dim (in=18432, the largest in-features the planner advertises;
    70B's 28672 is the same code path, VERDICT r3 item 1c).

    What scales with in_features (and is validated here at full size):
    the (in,in) Hessian buffer — f32 ONLY, ~1.3 GB here (the r2 code
    held an f64 copy, ~6.6 GB transient at this shape) — the chunked
    rank-k accumulation (calibrate._Hess.CHUNK bounds the staging
    copy), and the flip-trick f32 Cholesky+trtri (gptq.
    _cholesky_inv_upper). out_features only scales the per-row encode
    linearly and is kept small, so this runs in minutes, not hours.
    """
    from vptq_tpu.quant.calibrate import _Hess

    import jax.numpy as jnp

    n = 18432
    rng = np.random.default_rng(0)
    hess = _Hess(n)
    for _ in range(2):
        x = jnp.asarray(
            rng.standard_normal((4096, n)).astype(np.float32) * 0.5
        )
        hess.update(x)
    assert hess.h.dtype == np.float32
    assert hess.count == 8192

    out = 64
    w = (rng.standard_normal((out, n)) * 0.02).astype(np.float32)
    q, s = gptq_quantize(w, hess.h, bits=4, group=128)
    assert q.shape == (out, n) and np.abs(q).max() <= 7
    w_hat = dequant_groups(q, s, group_spans(n, 128))
    assert np.all(np.isfinite(w_hat))

    # feedback must stay inside RTN's OUTPUT-error envelope under H
    # (the quantity GPTQ minimizes; 8192 samples < in=18432 makes H
    # rank-deficient — the realistic case — so weight-space error is
    # NOT controlled: null-space feedback drift is free and measured
    # ~2.7x RTN's weight RMS while output error still improves)
    q0, s0 = gptq_quantize(w, None, bits=4, group=128)
    w0 = dequant_groups(q0, s0, group_spans(n, 128))
    e = output_error_ratio(w, w_hat, hess.h)
    e0 = output_error_ratio(w, w0, hess.h)
    assert e <= e0 * 1.05, (e, e0)
