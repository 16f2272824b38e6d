"""ctypes bindings for the native host-ingestion library.

Loads (building on first use if a compiler is available)
``libvptq_host.so`` from ``csrc/vptq_host.cc`` — multithreaded C++
implementations of the ingestion hot loops. Every entry point has a
numpy fallback with identical semantics (the numpy versions in
``vptq_tpu.ops`` are the oracle; parity is tested in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("vptq_tpu")

__all__ = [
    "available",
    "unpack_indices",
    "dequant",
    "int8_group_quant",
    "int4_group_quant",
    "int2_group_quant",
]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_PKG_DIR = Path(__file__).resolve().parent
_REPO_ROOT = _PKG_DIR.parent.parent
_SRC = _REPO_ROOT / "csrc" / "vptq_host.cc"
_SO = _PKG_DIR / "libvptq_host.so"

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32


def _build() -> bool:
    if not _SRC.exists():
        return False
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=300
        )
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native build failed (%s); using numpy", e)
        return False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VPTQ_TPU_NO_NATIVE") == "1":
        return None
    if not _SO.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:  # pragma: no cover
        logger.warning("native load failed (%s); using numpy", e)
        return None

    lib.vptq_unpack_indices.argtypes = [
        ctypes.c_void_p, _i64, _i64, _i64, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.vptq_dequant.argtypes = [ctypes.c_void_p] * 2 + [
        ctypes.c_void_p
    ] * 7 + [_i64] * 12 + [ctypes.c_void_p]
    lib.vptq_int8_quant.argtypes = [
        ctypes.c_void_p, _i64, _i64, _i64, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.vptq_int4_quant.argtypes = [
        ctypes.c_void_p, _i64, _i64, _i64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.vptq_int2_quant.argtypes = [
        ctypes.c_void_p, _i64, _i64, _i64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a: Optional[np.ndarray]):
    return None if a is None else a.ctypes.data_as(ctypes.c_void_p)


def unpack_indices(
    packed: np.ndarray,  # int32 (..., packed_words)
    index_bits: int,
    group_size: int,
    res_bits: int = 0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Native-or-numpy unpack; same contract as ops.packing.unpack_index
    but returns uint16 planes."""
    lib = _lib()
    if lib is None:
        from vptq_tpu.ops.packing import unpack_index

        main, res = unpack_index(
            packed, index_bits, group_size, res_bits
        )
        return (
            main.astype(np.uint16),
            None if res is None else res.astype(np.uint16),
        )

    lead = packed.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    packed_c = np.ascontiguousarray(packed.view(np.int32))
    main = np.empty((rows, group_size), np.uint16)
    res = np.empty((rows, group_size), np.uint16) if res_bits else None
    lib.vptq_unpack_indices(
        _ptr(packed_c), rows, packed.shape[-1], group_size,
        index_bits, res_bits, _ptr(main), _ptr(res),
    )
    main = main.reshape(*lead, group_size)
    if res is not None:
        res = res.reshape(*lead, group_size)
    return main, res


def dequant(
    centroids: np.ndarray,  # f32 (C, K, v)
    ids: np.ndarray,  # u16 (C, R, G)
    res_centroids: Optional[np.ndarray],
    res_ids: Optional[np.ndarray],
    outlier_centroids: Optional[np.ndarray],  # f32 (1, Ko, vo)
    outlier_ids: Optional[np.ndarray],  # u16 (1, Ro, outlier_size)
    inv_perm: Optional[np.ndarray],  # i32 (in,)
    weight_scale: Optional[np.ndarray],  # f32 (in,)
    weight_bias: Optional[np.ndarray],
    out_features: int,
    in_features: int,
) -> Optional[np.ndarray]:
    """Exact reconstruction; returns None if native lib unavailable."""
    lib = _lib()
    if lib is None:
        return None

    c, k, v = centroids.shape
    _, r, g = ids.shape
    ctr = np.ascontiguousarray(centroids, np.float32)
    ids_c = np.ascontiguousarray(ids, np.uint16)
    rc = (
        None
        if res_centroids is None
        else np.ascontiguousarray(res_centroids, np.float32)
    )
    ri = (
        None
        if res_ids is None
        else np.ascontiguousarray(res_ids, np.uint16)
    )
    kr = 0 if rc is None else rc.shape[1]
    if outlier_centroids is not None:
        oc = np.ascontiguousarray(outlier_centroids, np.float32)
        oi = np.ascontiguousarray(outlier_ids, np.uint16)
        ko, vo = oc.shape[1], oc.shape[2]
        outlier_size = oi.shape[2]
        ro = oi.shape[1]
    else:
        oc = oi = None
        ko = vo = outlier_size = ro = 0
        vo = 1  # avoid div-by-zero in the kernel's modulo math
    ip = (
        None
        if inv_perm is None
        else np.ascontiguousarray(inv_perm, np.int32)
    )
    ws = (
        None
        if weight_scale is None
        else np.ascontiguousarray(weight_scale, np.float32)
    )
    wb = (
        None
        if weight_bias is None
        else np.ascontiguousarray(weight_bias, np.float32)
    )

    out = np.empty((out_features, in_features), np.float32)
    lib.vptq_dequant(
        _ptr(ctr), _ptr(ids_c), _ptr(rc), _ptr(ri), _ptr(oc),
        _ptr(oi), _ptr(ip), _ptr(ws), _ptr(wb),
        out_features, in_features, c, k, kr, v, g, r,
        outlier_size, ko, vo, ro, _ptr(out),
    )
    return out


def int8_group_quant(
    w: np.ndarray, group: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Per-(row, group) symmetric int8; returns None without native."""
    lib = _lib()
    if lib is None:
        return None
    rows, cols = w.shape
    if cols % group:
        raise ValueError("cols must divide group")
    w_c = np.ascontiguousarray(w, np.float32)
    q = np.empty((rows, cols), np.int8)
    scales = np.empty((rows, cols // group), np.float32)
    lib.vptq_int8_quant(
        _ptr(w_c), rows, cols, group, _ptr(q), _ptr(scales)
    )
    return q, scales


def int2_group_quant(
    w: np.ndarray, group: int, optimize: bool = True
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Per-(row, group) half-offset int2 with MSE-optimal scale search
    (semantics of ops.packing.quantize_int2); None without native."""
    lib = _lib()
    if lib is None:
        return None
    rows, cols = w.shape
    if cols % group:
        raise ValueError("cols must divide group")
    w_c = np.ascontiguousarray(w, np.float32)
    q = np.empty((rows, cols), np.int8)
    scales = np.empty((rows, cols // group), np.float32)
    lib.vptq_int2_quant(
        _ptr(w_c), rows, cols, group, 1 if optimize else 0,
        _ptr(q), _ptr(scales),
    )
    return q, scales


def int4_group_quant(
    w: np.ndarray, group: int, optimize: bool = True
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Per-(row, group) symmetric int4 with MSE-optimal scale search
    (semantics of ops.packing.quantize_int4); None without native."""
    lib = _lib()
    if lib is None:
        return None
    rows, cols = w.shape
    if cols % group:
        raise ValueError("cols must divide group")
    w_c = np.ascontiguousarray(w, np.float32)
    q = np.empty((rows, cols), np.int8)
    scales = np.empty((rows, cols // group), np.float32)
    lib.vptq_int4_quant(
        _ptr(w_c), rows, cols, group, 1 if optimize else 0,
        _ptr(q), _ptr(scales),
    )
    return q, scales
