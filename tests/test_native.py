"""Native C++ ingestion kernels vs the numpy oracle."""

import numpy as np
import pytest

from vptq_tpu import native
from vptq_tpu.ops.dequant import dequant_weight
from vptq_tpu.ops.packing import pack_index, unpack_index
from vptq_tpu.utils.synth import make_config, make_numpy_planes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_unpack_matches_numpy():
    rng = np.random.default_rng(0)
    for index_bits, res_bits in [(16, 8), (13, 0), (12, 4), (15, 15)]:
        shape = (2, 9, 47)
        main = rng.integers(0, 2**index_bits, size=shape)
        res = (
            rng.integers(0, 2**res_bits, size=shape) if res_bits else None
        )
        packed = pack_index(main, index_bits, res, res_bits)

        m1, r1 = unpack_index(
            packed, index_bits, shape[-1], res_bits
        )
        m2, r2 = native.unpack_indices(
            packed, index_bits, shape[-1], res_bits
        )
        np.testing.assert_array_equal(m1, m2.astype(np.int64))
        if res_bits:
            np.testing.assert_array_equal(r1, r2.astype(np.int64))


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(num_res_centroids=16),
        dict(
            in_features=160,
            out_features=92,
            num_centroids=512,
            num_res_centroids=32,
            outlier_size=32,
            outlier_vector_len=4,
            num_outlier_centroids=64,
            enable_perm=True,
            enable_norm=True,
        ),
        dict(num_codebooks=2),
    ],
    ids=["plain", "residual", "everything", "two_codebooks"],
)
def test_native_dequant_matches_numpy(kwargs):
    cfg = make_config(**kwargs)
    planes = make_numpy_planes(cfg, seed=13)

    inv_perm = (
        None
        if planes["perm"] is None
        else np.argsort(planes["perm"].astype(np.int64)).astype(
            np.int32
        )
    )
    ref = dequant_weight(
        centroids=planes["centroids"],
        ids=planes["ids"].astype(np.int64),
        res_centroids=planes["res_centroids"],
        res_ids=None
        if planes["res_ids"] is None
        else planes["res_ids"].astype(np.int64),
        outlier_centroids=planes["outlier_centroids"],
        outlier_ids=None
        if planes["outlier_ids"] is None
        else planes["outlier_ids"].astype(np.int64),
        inv_perm=inv_perm,
        weight_scale=planes["weight_scale"],
        weight_bias=planes["weight_bias"],
        cfg=cfg,
        xp=np,
    )

    got = native.dequant(
        centroids=planes["centroids"],
        ids=planes["ids"].astype(np.uint16),
        res_centroids=planes["res_centroids"],
        res_ids=None
        if planes["res_ids"] is None
        else planes["res_ids"].astype(np.uint16),
        outlier_centroids=planes["outlier_centroids"],
        outlier_ids=None
        if planes["outlier_ids"] is None
        else planes["outlier_ids"].astype(np.uint16),
        inv_perm=inv_perm,
        weight_scale=planes["weight_scale"],
        weight_bias=planes["weight_bias"],
        out_features=cfg.out_features,
        in_features=cfg.in_features,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_native_int8_matches_numpy():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((64, 1024)).astype(np.float32)
    group = 256
    q, scales = native.int8_group_quant(w, group)

    g = w.reshape(64, -1, group)
    absmax = np.max(np.abs(g), axis=-1)
    ref_scales = np.where(absmax > 0, absmax / 127.0, 1.0)
    ref_q = np.clip(
        np.round(g / ref_scales[:, :, None]), -127, 127
    ).astype(np.int8)

    np.testing.assert_allclose(scales, ref_scales, rtol=1e-6)
    np.testing.assert_array_equal(q, ref_q.reshape(64, -1))


def test_native_int2_quant_matches_numpy():
    """vptq_int2_quant (half-offset grid, 13-candidate search) must
    match ops.packing.quantize_int2 bit-for-bit."""
    from vptq_tpu import native
    from vptq_tpu.ops.packing import quantize_int2

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    w = (rng.standard_t(4, (64, 1024)) * 0.02).astype(np.float32)
    qn, sn = quantize_int2(w, group=64)
    got = native.int2_group_quant(w, 64)
    assert got is not None
    qc, sc = got
    np.testing.assert_array_equal(qn, qc)
    np.testing.assert_allclose(sn, sc, rtol=0, atol=0)
