"""Bit-packing round-trip + golden parity with the reference packer."""

import numpy as np
import pytest

from vptq_tpu.ops.packing import pack_index, unpack_index

BIT_CONFIGS = [
    (16, 8),  # k=65536 main + 256 residual (flagship community format)
    (16, 9),  # k=65536 + 512 residual
    (13, 0),  # k=8192, no residual
    (12, 4),
    (10, 6),
    (15, 15),
    (4, 0),
]


@pytest.mark.parametrize("index_bits,res_bits", BIT_CONFIGS)
def test_round_trip(index_bits, res_bits):
    rng = np.random.default_rng(1234)
    shape = (2, 7, 33)  # (codebooks, rows, group_size) — odd on purpose
    main = rng.integers(0, 2**index_bits, size=shape, dtype=np.uint64)
    res = None
    if res_bits:
        res = rng.integers(0, 2**res_bits, size=shape, dtype=np.uint64)

    packed = pack_index(main, index_bits, res, res_bits)
    assert packed.dtype == np.int32
    expected_words = -(-shape[-1] * (index_bits + res_bits) // 32)
    assert packed.shape == shape[:-1] + (expected_words,)

    main2, res2 = unpack_index(packed, index_bits, shape[-1], res_bits)
    np.testing.assert_array_equal(main.astype(np.int64), main2)
    if res_bits:
        np.testing.assert_array_equal(res.astype(np.int64), res2)
    else:
        assert res2 is None


@pytest.mark.parametrize("index_bits,res_bits", [(16, 8), (13, 0), (12, 4)])
def test_golden_vs_reference(index_bits, res_bits):
    """Word-for-word parity with the reference pack/unpack

    (reference vptq/utils/pack.py:26-139)."""
    torch = pytest.importorskip("torch")
    from oracle import load_reference_ops

    ref_pack, _ = load_reference_ops()

    rng = np.random.default_rng(7)
    shape = (1, 8, 128)
    main = rng.integers(0, 2**index_bits, size=shape, dtype=np.uint64)
    res = (
        rng.integers(0, 2**res_bits, size=shape, dtype=np.uint64)
        if res_bits
        else None
    )

    ours = pack_index(main, index_bits, res, res_bits)

    t_main = torch.from_numpy(main.astype(np.int64)).to(torch.uint16)
    t_res = (
        torch.from_numpy(res.astype(np.int64)).to(torch.uint16)
        if res_bits
        else None
    )
    theirs = ref_pack.pack_index(
        indice=t_main,
        index_bits=index_bits,
        res_indice=t_res,
        res_bits=res_bits,
        index_dtype=torch.uint16,
    )
    np.testing.assert_array_equal(ours, theirs.numpy())

    # and unpack parity on the packed words
    ref_main, ref_res = ref_pack.unpack_index_tensor(
        theirs, index_bits, shape[-1], res_bits, shape[-1] if res_bits else 0
    )
    our_main, our_res = unpack_index(ours, index_bits, shape[-1], res_bits)
    np.testing.assert_array_equal(our_main, ref_main.numpy())
    if res_bits:
        np.testing.assert_array_equal(our_res, ref_res.numpy())
