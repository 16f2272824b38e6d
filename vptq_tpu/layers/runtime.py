"""Runtime weight formats: the TPU-native re-encoding of VPTQ layers.

Measured on v5e (see ARCHITECTURE.md): per-element codebook gather runs
at ~0.36 G ids/s through XLA and Mosaic's ``dynamic_gather`` handles
only 8-sublane tables, so the CUDA-style fused gather-GEMV (reference
csrc/kernels/quant_gemv.cuh) cannot be expressed efficiently on TPU
vector hardware. Instead, the loader reconstructs the exact VPTQ weight
ONCE at ingestion (host/XLA gather) and re-encodes it into a dense
runtime format the MXU eats at HBM speed-of-light:

  * ``int8``  — per-(row, in-group) scaled int8, group == kernel
    in-tile (default 2048). RMS re-encoding error ~0.4% — two orders
    of magnitude inside the reference's own fused-kernel tolerance
    (rtol=atol=0.2, reference tests/test_quant_gemv.py:183).
  * ``bf16``  — bit-exact dequantized weights (2x memory of int8).
  * ``codebook`` — keep the compressed VQLinear and gather per call
    (exact + minimal HBM, but orders of magnitude slower; for
    memory-constrained or verification use).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import struct

from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.vqlinear import VQLinear
from vptq_tpu.ops.dequant import dequant_weight

__all__ = [
    "Int8Linear",
    "Int4Linear",
    "Int3Linear",
    "Int3MixedLinear",
    "Int2Linear",
    "Int2MixedLinear",
    "to_runtime",
    "RUNTIME_FORMATS",
]

RUNTIME_FORMATS = ("int8", "int4", "int3", "int2", "bf16", "codebook")

# Scale-group width along in_features; the w8 kernel's in_tile must
# divide it (scales apply on the accumulator). Chosen per layer: the
# largest tile whose zero-padding waste stays small.
GROUP_CANDIDATES = (2048, 1024, 512)


def pick_tiles(out_f: int, in_p: int, group: int, tokens: int = 1):
    """(out_tile, in_tile) for the fused dequant matmul.

    From a v5e sweep over 7B decode shapes (examples/autotune_w8.py):
    in_tile 2048 and out_tile 512-1024 sit on a ~700-810 GB/s plateau
    (85-99% of HBM); small tiles fall to ~300-450 GB/s; at prefill
    token counts (T=512) (1024, 2048) reaches ~170-225 TFLOP/s.

    The kernel tiles the token dim at 512 internally (w8_matmul), so
    these picks fit VMEM at any token count.
    """
    del tokens
    in_tile = group
    for cand in (2048, 1024, 512):
        if cand <= group and group % cand == 0 and in_p % cand == 0:
            in_tile = cand
            break
    out_tile = 1024 if out_f >= 1024 else (512 if out_f >= 512 else 256)
    return out_tile, in_tile


def pick_group(in_features: int, max_waste: float = 0.03) -> int:
    for g in GROUP_CANDIDATES:
        pad = (-in_features) % g
        if pad / (in_features + pad) <= max_waste:
            return g
    return GROUP_CANDIDATES[-1]


@struct.dataclass
class Int8Linear:
    """Dense int8 weights + per-(in-group, out-row) scales.

    ``wq`` is zero-padded along in_features to a multiple of the scale
    group; ``__call__`` pads activations to match (zeros contribute
    nothing to the dot product).
    """

    wq: jnp.ndarray  # (out, in_padded) int8
    scales: jnp.ndarray  # (in_padded // group, out) f32
    bias: Optional[jnp.ndarray] = None

    @property
    def group(self) -> int:
        return self.wq.shape[1] // self.scales.shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vptq_tpu.ops.pallas_gemm import w8_matmul
        from vptq_tpu.ops.quant_matmul import use_pallas

        in_padded = self.wq.shape[1]
        if x.shape[-1] != in_padded:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_padded - x.shape[-1])]
            x = jnp.pad(x, pad)

        if use_pallas():
            tokens = 1
            for d in x.shape[:-1]:
                tokens *= d
            ot, it = pick_tiles(
                self.wq.shape[0], in_padded, self.group, tokens
            )
            out = w8_matmul(
                x, self.wq, self.scales, out_tile=ot, in_tile=it,
            )
        else:
            w = (
                self.wq.astype(jnp.float32).reshape(
                    self.wq.shape[0], -1, self.group
                )
                * self.scales.T[:, :, None]
            ).reshape(self.wq.shape)
            out = jnp.dot(
                x.astype(jnp.float32), w.T,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.wq.shape[0]


@struct.dataclass
class Int4Linear:
    """Packed int4 weights + per-(row, 128-in-column) bf16 scales.

    The throughput format: halves the decode HBM traffic of ``int8`` at
    ~12% weight-RMS re-encode error (standard int4-RTN fidelity; the
    quality/speed trade is the user's via ``runtime_format="int4"``).
    Nibble layout contract: :func:`vptq_tpu.ops.packing.pack_int4`.
    """

    wq: jnp.ndarray  # (out, in_padded // 2) int8 — packed nibbles
    scales: jnp.ndarray  # (in_padded // 128, out) bf16 (transposed —
    # the kernel slices scale rows per in-step; see w4_matmul)
    bias: Optional[jnp.ndarray] = None

    @property
    def in_padded(self) -> int:
        return self.wq.shape[1] * 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vptq_tpu.ops.pallas_gemm import w4_matmul
        from vptq_tpu.ops.quant_matmul import use_pallas

        in_padded = self.in_padded
        if x.shape[-1] != in_padded:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_padded - x.shape[-1])]
            x = jnp.pad(x, pad)

        if use_pallas():
            # in_tile: largest tile dividing in_padded (scales are
            # pre-blocked per step, so any multiple of 256 works —
            # shard_map TP shards pad to 512, single-device to 2048).
            # out_tile from the v5e sweep (examples/autotune_w4.py,
            # re-run after the shift28 unpack): 2048 wins at decode
            # token counts on EVERY 7B shape (535-617 GB/s); 1024 at
            # prefill (the f32 accumulator + out double-buffer of a
            # (512-token, 2048-out) tile would overflow VMEM)
            tokens = 1
            for d in x.shape[:-1]:
                tokens *= d
            out_f = self.wq.shape[0]
            ot = (
                2048 if (out_f >= 2048 and tokens <= 64)
                else (1024 if out_f >= 1024
                      else (512 if out_f >= 512 else 256))
            )
            it = next(
                t for t in (2048, 1024, 512, 256)
                if in_padded % t == 0
            )
            out = w4_matmul(
                x, self.wq, self.scales,
                out_tile=ot, in_tile=it,
            )
        else:
            q = _unpack_int4_jnp(self.wq)
            w = (
                q.astype(jnp.float32).reshape(
                    self.wq.shape[0], -1, 128
                )
                * self.scales.astype(jnp.float32).T[:, :, None]
            ).reshape(self.wq.shape[0], in_padded)
            out = jnp.dot(
                x.astype(jnp.float32), w.T,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.wq.shape[0]


def _unpack_int4_jnp(packed: jnp.ndarray) -> jnp.ndarray:
    """jnp mirror of packing.unpack_int4 (non-pallas fallback path)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=1)


@struct.dataclass
class Int3Linear:
    """Plane-packed int3 weights + per-(row, 128-in-col) bf16 scales.

    The sub-4-bit memory-floor format (~3.1 bits/weight): 25% less
    decode HBM traffic than ``int4`` at ~20% weight-RMS re-encode
    error (RTN; pair with the calibrated encoder / mixed precision
    for fidelity — quant/calibrate.py). 70B fits 2 v5e chips
    (tools/plan.py). Plane layout contract:
    :func:`vptq_tpu.ops.packing.pack_int3`. NOTE ``scales`` is
    out-MAJOR — (out, in_p/128) — unlike Int4Linear (see w3_matmul).
    """

    wq2: jnp.ndarray  # (out, in_padded // 4) int8 — 2-bit plane
    wq1: jnp.ndarray  # (out, in_padded // 8) int8 — sign plane
    scales: jnp.ndarray  # (out, in_padded // 128) bf16
    bias: Optional[jnp.ndarray] = None

    @property
    def in_padded(self) -> int:
        return self.wq2.shape[1] * 4

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vptq_tpu.ops.pallas_gemm import w3_matmul
        from vptq_tpu.ops.quant_matmul import use_pallas

        in_padded = self.in_padded
        if x.shape[-1] != in_padded:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_padded - x.shape[-1])]
            x = jnp.pad(x, pad)

        if use_pallas():
            # v5e sweep (examples/autotune_w3.py): out_tile 2048 /
            # in_tile 1024 lead on every 7B decode shape (~200 GB/s,
            # VPU-bound — see w3_matmul)
            out_f = self.wq2.shape[0]
            ot = (
                2048 if out_f >= 2048
                else (1024 if out_f >= 1024
                      else (512 if out_f >= 512 else 256))
            )
            out = w3_matmul(
                x, self.wq2, self.wq1, self.scales,
                out_tile=ot, in_tile=1024,
            )
        else:
            q = _unpack_int3_jnp(self.wq2, self.wq1)
            w = (
                q.astype(jnp.float32).reshape(
                    self.wq2.shape[0], -1, 128
                )
                * self.scales.astype(jnp.float32)[:, :, None]
            ).reshape(self.wq2.shape[0], in_padded)
            out = jnp.dot(
                x.astype(jnp.float32), w.T,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.wq2.shape[0]


@struct.dataclass
class Int2Linear:
    """Plane-packed int2 weights + per-(row, group-col) bf16 scales.

    The ~2-bit serving operating point — the reference's entire
    published table lives at 2.02-2.26 bits/weight (reference
    README.md:274-279); this is its TPU-native dense counterpart:
    ``w = (c + 0.5) * s`` with c in {-2..1} (half-offset symmetric
    levels) and group-64 scales by default (2.25 bits/weight).
    Kernel contract: :func:`vptq_tpu.ops.packing.pack_int2` /
    :func:`vptq_tpu.ops.pallas_gemm.w2_matmul`. Pair with
    :class:`Int2MixedLinear` (calibrated int8 outlier columns) for
    fidelity — raw 2-bit RTN is a capacity probe, not a quality
    format.
    """

    wq: jnp.ndarray  # (out, in_padded // 4) int8 — 2-bit plane
    scales: jnp.ndarray  # (out, in_padded // group) bf16
    bias: Optional[jnp.ndarray] = None

    @property
    def in_padded(self) -> int:
        return self.wq.shape[1] * 4

    @property
    def group(self) -> int:
        return self.in_padded // self.scales.shape[1]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vptq_tpu.ops.pallas_gemm import w2_matmul
        from vptq_tpu.ops.quant_matmul import use_pallas

        in_padded = self.in_padded
        if x.shape[-1] != in_padded:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_padded - x.shape[-1])]
            x = jnp.pad(x, pad)

        if use_pallas():
            # out_tile 2048 only at decode token counts (the w4
            # rationale): at prefill the f32 accumulator + out double
            # buffer of a (256-token, 2048-out) tile overflows the
            # 16 MB scoped-VMEM budget
            tokens = 1
            for d in x.shape[:-1]:
                tokens *= d
            out_f = self.wq.shape[0]
            ot = (
                2048 if (out_f >= 2048 and tokens <= 64)
                else (1024 if out_f >= 1024
                      else (512 if out_f >= 512 else 256))
            )
            out = w2_matmul(
                x, self.wq, self.scales,
                out_tile=ot, in_tile=1024,
            )
        else:
            q = _unpack_int2_jnp(self.wq)
            group = self.group
            w = (
                (q.astype(jnp.float32) + 0.5).reshape(
                    self.wq.shape[0], -1, group
                )
                * self.scales.astype(jnp.float32)[:, :, None]
            ).reshape(self.wq.shape[0], in_padded)
            out = jnp.dot(
                x.astype(jnp.float32), w.T,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.wq.shape[0]


def _unpack_int2_jnp(wq: jnp.ndarray) -> jnp.ndarray:
    """jnp mirror of packing.unpack_int2 (non-pallas fallback path)."""
    b = wq.astype(jnp.int32)
    u = jnp.concatenate(
        [
            jnp.bitwise_and(jnp.right_shift(b, 2 * q), 3)
            for q in range(4)
        ],
        axis=1,
    )
    return jnp.where(u >= 2, u - 4, u).astype(jnp.int8)


# default int8 COLUMN fraction of the int2-mixed format. The floor in
# calibrate._select_cols is 128 columns, so at 7B attention width
# (4096) this resolves to 1/32; at MLP width (11008) to 256/11008.
# Effective bits at 7B: 2.25 (int2 plane + group-64 scales) +
# ~0.03 * 8.25 (int8 side) ~= 2.5 bits/weight — the reference's own
# operating band (2.02-2.26 published + its outlier machinery).
INT2_MIXED_COL_FRACTION = 1 / 48


@struct.dataclass
class Int2MixedLinear:
    """int2 plane + an int8 side matrix on the sensitive input columns.

    The calibrated ~2.5-bit serving format: the measured-most-
    sensitive input columns are carried int8; the int2 encode zeroes
    them first (tightening every polluted group-64 scale) and the int8
    side holds the RESIDUAL ``w[:, cols] - w2hat[:, cols]`` — the
    half-offset grid cannot represent exact zero, so the side matrix
    absorbs the leftover ±0.5*s of the zeroed plane positions
    (quant/calibrate._gptq_layer_int2_mixed).

    ``y = int2(x) + int8(x[..., col_idx])`` — both sides ride their
    existing Pallas kernels. Blocked shard_map-TP instances follow the
    Int3MixedLinear contract (shard-local ``col_idx``, placement-only
    artifact).
    """

    int2: Int2Linear
    int8: Int8Linear
    col_idx: jnp.ndarray  # (k,) int32 — original input columns
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = jnp.take(x, self.col_idx, axis=-1)
        out = self.int2(x) + self.int8(xs).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.int2.out_features

    @property
    def in_padded(self) -> int:
        return self.int2.in_padded


# default int8 COLUMN fraction of the int3-mixed format: the
# measured-most-sensitive ~3% of input columns (per site, scattered —
# not whole 128-col groups) go int8. Effective bits: 3.13 (int3
# planes+scales, selected columns stored as zeros) + 1/32 * 8.25
# (int8 side matrix) ~= 3.4 bits/weight at 70B geometry — the memory
# floor survives, unlike site-level mixing (~5.5 bits at the budget
# that helped). Per-column granularity also re-tightens every scale
# group an outlier channel polluted (the encoder zeroes selected
# columns BEFORE picking int3 group scales).
INT3_MIXED_COL_FRACTION = 1 / 32


@struct.dataclass
class Int3MixedLinear:
    """int3 planes + an int8 side matrix on the sensitive input groups.

    Per-column mixed precision (VERDICT r3 item 6): the
    measured-most-sensitive ~3% of input columns are encoded int8
    (their int3 plane positions hold zeros), the rest stay int3.
    ``y = int3(x) + int8(x[..., col_idx])`` — both sides ride their
    existing Pallas kernels; the side-gather touches only activations
    (O(T*k), negligible at decode).

    Site-level int8 fallback needed ~50% of sites (~5.5 bits/weight)
    to fix int3's fidelity; column granularity targets the actual
    error mass (input-channel outliers clipped by the asymmetric
    [-4,3] range) at ~4.0 bits/weight.

    Under blocked shard_map TP (parallel/tp.py) row-parallel sites
    select the SAME column count inside every contiguous input shard
    and ``col_idx`` holds SHARD-LOCAL ids (each device gathers from
    its local activation slice); such a blocked instance is a
    placement-only artifact — calling it single-device computes
    garbage, exactly like the blocked int3/int4/int8 encodings.
    """

    int3: Int3Linear
    int8: Int8Linear
    col_idx: jnp.ndarray  # (k,) int32 — original input columns
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = jnp.take(x, self.col_idx, axis=-1)
        out = self.int3(x) + self.int8(xs).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    @property
    def out_features(self) -> int:
        return self.int3.out_features

    @property
    def in_padded(self) -> int:
        return self.int3.in_padded


def _unpack_int3_jnp(wq2: jnp.ndarray, wq1: jnp.ndarray) -> jnp.ndarray:
    """jnp mirror of packing.unpack_int3 (non-pallas fallback path)."""
    b2 = wq2.astype(jnp.int32)
    b1 = wq1.astype(jnp.int32)
    two = jnp.concatenate(
        [
            jnp.bitwise_and(jnp.right_shift(b2, 2 * q), 3)
            for q in range(4)
        ],
        axis=1,
    )
    sign = jnp.concatenate(
        [jnp.bitwise_and(jnp.right_shift(b1, m), 1) for m in range(8)],
        axis=1,
    )
    return (two - 4 * sign).astype(jnp.int8)


RuntimeLinear = Union[
    VQLinear, DenseLinear, Int8Linear, Int4Linear, Int3Linear,
    Int3MixedLinear, Int2Linear, Int2MixedLinear,
]


def _exact_weight(layer: VQLinear, dtype=jnp.float32) -> "np.ndarray":
    """Exact dequant on the host (numpy): the one-time re-encode path.

    numpy's gather is ~100x faster than XLA-on-TPU gather for this
    shape of work, and keeps the TPU free during model load.
    """
    import jax
    import numpy as np

    def host(x, d=None):
        if x is None:
            return None
        a = jax.device_get(x)
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)
        a = np.asarray(a)
        return a if d is None else a.astype(d)

    from vptq_tpu import native

    if native.available():
        got = native.dequant(
            centroids=host(layer.centroids, np.float32),
            ids=host(layer.ids, np.uint16),
            res_centroids=host(layer.res_centroids, np.float32),
            res_ids=host(layer.res_ids, np.uint16)
            if layer.res_ids is not None
            else None,
            outlier_centroids=host(
                layer.outlier_centroids, np.float32
            ),
            outlier_ids=host(layer.outlier_ids, np.uint16)
            if layer.outlier_ids is not None
            else None,
            inv_perm=host(layer.inv_perm, np.int32)
            if layer.inv_perm is not None
            else None,
            weight_scale=host(layer.weight_scale, np.float32),
            weight_bias=host(layer.weight_bias, np.float32),
            out_features=layer.cfg.out_features,
            in_features=layer.cfg.in_features,
        )
        if got is not None:
            return got

    return dequant_weight(
        centroids=host(layer.centroids, np.float32),
        ids=host(layer.ids, np.int64),
        res_centroids=host(layer.res_centroids, np.float32),
        res_ids=host(layer.res_ids, np.int64)
        if layer.res_ids is not None
        else None,
        outlier_centroids=host(layer.outlier_centroids, np.float32),
        outlier_ids=host(layer.outlier_ids, np.int64)
        if layer.outlier_ids is not None
        else None,
        inv_perm=host(layer.inv_perm),
        weight_scale=host(layer.weight_scale, np.float32),
        weight_bias=host(layer.weight_bias, np.float32),
        cfg=layer.cfg,
        xp=np,
    )


def _encode_int8(
    w, bias, group: Optional[int] = None, shards: int = 1
) -> Int8Linear:
    """f32 (out, in) numpy weight → Int8Linear (host arrays).

    ``shards > 1`` produces the BLOCKED layout for shard_map tensor
    parallelism (parallel/tp.py): the in axis is split into ``shards``
    contiguous column blocks and each block is encoded independently
    (its own group size and zero-padding), so slicing the result into
    ``shards`` equal column chunks yields ``shards`` self-contained
    Int8Linear shards — each device's local kernel sees a standard
    int8 layout with no cross-shard scale groups.
    """
    import numpy as np

    if shards > 1:
        pad = (-w.shape[1]) % shards
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)))
        blk = w.shape[1] // shards
        parts = [
            _encode_int8(w[:, s * blk: (s + 1) * blk], None, group)
            for s in range(shards)
        ]
        return Int8Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=0),
            bias=bias,
        )

    group = group or pick_group(w.shape[1])
    pad = (-w.shape[1]) % group
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    out_f, in_p = w.shape

    from vptq_tpu import native

    got = (
        native.int8_group_quant(
            np.ascontiguousarray(w, np.float32), group
        )
        if native.available()
        else None
    )
    if got is not None:
        q, scale = got
    else:
        g = w.reshape(out_f, in_p // group, group)
        absmax = np.max(np.abs(g), axis=-1)  # (out, n_groups)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
            np.float32
        )
        q = np.clip(
            np.round(g / scale[:, :, None]), -127, 127
        ).astype(np.int8)
    return Int8Linear(
        wq=np.ascontiguousarray(q.reshape(out_f, in_p)),
        scales=np.ascontiguousarray(scale.reshape(out_f, -1).T),
        bias=bias,
    )


def to_int8(layer: VQLinear, group: Optional[int] = None) -> Int8Linear:
    """Exact dequant → symmetric per-(row, group) int8 re-encode.

    Returns HOST (numpy) arrays: device placement — single-chip upload
    or direct sharded ``device_put`` onto a mesh — is the caller's one
    explicit step (``models/loader.py``), so a 70B model never needs to
    exist unsharded on one chip.
    """
    return _encode_int8(_exact_weight(layer), layer.bias, group)


def dense_to_int8(
    layer: DenseLinear, group: Optional[int] = None
) -> Int8Linear:
    """Re-encode an unquantized (bf16) linear — e.g. lm_head — to the
    int8 runtime format (halves its decode HBM traffic)."""
    import jax
    import numpy as np

    w = np.asarray(jax.device_get(layer.weight), np.float32)
    return _encode_int8(w, layer.bias, group)


def int8_weight(layer: Int8Linear) -> "np.ndarray":
    """Exact f32 dequant of the int8 runtime layout (host)."""
    import jax
    import numpy as np

    wq = np.asarray(jax.device_get(layer.wq))
    s = np.asarray(jax.device_get(layer.scales), np.float32).T
    group = wq.shape[1] // s.shape[1]
    return (
        wq.astype(np.float32).reshape(wq.shape[0], -1, group)
        * s[:, :, None]
    ).reshape(wq.shape)


def int4_weight(layer: Int4Linear) -> "np.ndarray":
    """Exact f32 dequant of the packed int4 runtime layout (host)."""
    import jax
    import numpy as np

    from vptq_tpu.ops.packing import unpack_int4

    q = unpack_int4(np.asarray(jax.device_get(layer.wq)))
    s = np.asarray(jax.device_get(layer.scales), np.float32).T
    return (
        q.astype(np.float32).reshape(q.shape[0], -1, 128)
        * s[:, :, None]
    ).reshape(q.shape)


def _encode_int4(
    w, bias, shards: int = 1, pad_to: int = 2048
) -> Int4Linear:
    """f32 (out, in) numpy weight → packed Int4Linear.

    Pads in_features to ``pad_to`` (a kernel in_tile multiple) — see
    Int4Linear. The scale for each (row, 128-col) group is picked by
    an MSE-optimal grid search (ops.packing.quantize_int4 / native
    vptq_int4_quant).

    ``shards > 1``: blocked layout for shard_map TP — each contiguous
    column block is encoded (and nibble-packed) independently. Shards
    of >= 512 columns pad to 512 (keeps the local kernel's in_tile
    wide); smaller shards pad to the kernel's 256 minimum instead —
    at high TP degrees on narrow layers (e.g. 7B o_proj at tp=32:
    128-column shards) the 512 pad cost 4x the bytes, 256 halves it.
    """
    import numpy as np

    from vptq_tpu import native
    from vptq_tpu.ops.packing import pack_int4, quantize_int4

    if shards > 1:
        pad = (-w.shape[1]) % shards
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)))
        blk = w.shape[1] // shards
        shard_pad = 512 if blk >= 512 else 256
        parts = [
            _encode_int4(
                w[:, s * blk: (s + 1) * blk], None, pad_to=shard_pad
            )
            for s in range(shards)
        ]
        return Int4Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=0),
            bias=bias,
        )

    pad = (-w.shape[1]) % pad_to
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    got = (
        native.int4_group_quant(
            np.ascontiguousarray(w, np.float32), 128
        )
        if native.available()
        else None
    )
    if got is not None:
        q, scale = got
    else:
        q, scale = quantize_int4(w)
    return Int4Linear(
        wq=pack_int4(q),
        scales=np.ascontiguousarray(scale.T).astype(jnp.bfloat16),
        bias=bias,
    )


def to_int4(layer: VQLinear) -> Int4Linear:
    """Exact dequant → symmetric per-(row, 128-col) int4 re-encode."""
    return _encode_int4(_exact_weight(layer), layer.bias)


def int4_from_q(q, scales, bias=None, pad_to: int = 2048) -> Int4Linear:
    """Build an Int4Linear from precomputed (q, scales) — the entry
    point for the calibrated/GPTQ encoder (quant/gptq.py), which picks
    q itself instead of RTN. ``q``: (out, in) int8 in [-7, 7] with
    ``in % 128 == 0``; ``scales``: (out, in // 128) f32 (already
    bf16-representable — the encoder rounds them)."""
    import numpy as np

    from vptq_tpu.ops.packing import pack_int4

    pad = (-q.shape[1]) % pad_to
    if pad:
        q = np.pad(q, ((0, 0), (0, pad)))
        scales = np.pad(
            scales, ((0, 0), (0, pad // 128)), constant_values=1.0
        )
    return Int4Linear(
        wq=pack_int4(np.ascontiguousarray(q)),
        scales=np.ascontiguousarray(scales.T).astype(jnp.bfloat16),
        bias=bias,
    )


def int8_from_q(q, scales, bias=None) -> Int8Linear:
    """Build an Int8Linear from precomputed (q, scales).
    ``q``: (out, in) int8, ``in`` a multiple of the scale group;
    ``scales``: (out, in // group) f32."""
    import numpy as np

    return Int8Linear(
        wq=np.ascontiguousarray(q),
        scales=np.ascontiguousarray(scales.T.astype(np.float32)),
        bias=bias,
    )


def dense_to_int4(layer: DenseLinear) -> Int4Linear:
    import jax
    import numpy as np

    w = np.asarray(jax.device_get(layer.weight), np.float32)
    return _encode_int4(w, layer.bias)


def int3_weight(layer: Int3Linear) -> "np.ndarray":
    """Exact f32 dequant of the plane-packed int3 layout (host)."""
    import jax
    import numpy as np

    from vptq_tpu.ops.packing import unpack_int3

    q = unpack_int3(
        np.asarray(jax.device_get(layer.wq2)),
        np.asarray(jax.device_get(layer.wq1)),
    )
    s = np.asarray(jax.device_get(layer.scales), np.float32)
    return (
        q.astype(np.float32).reshape(q.shape[0], -1, 128)
        * s[:, :, None]
    ).reshape(q.shape)


def _encode_int3(
    w, bias, shards: int = 1, pad_to: int = 2048
) -> Int3Linear:
    """f32 (out, in) numpy weight → plane-packed Int3Linear.

    ``shards > 1``: blocked layout for shard_map TP (per-shard
    padding to 1024 — the kernel's W3_BLOCK minimum)."""
    import numpy as np

    from vptq_tpu.ops.packing import pack_int3, quantize_int3

    if shards > 1:
        pad = (-w.shape[1]) % shards
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)))
        blk = w.shape[1] // shards
        parts = [
            _encode_int3(
                w[:, s * blk: (s + 1) * blk], None, pad_to=1024
            )
            for s in range(shards)
        ]
        return Int3Linear(
            wq2=np.concatenate([p.wq2 for p in parts], axis=1),
            wq1=np.concatenate([p.wq1 for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=1),
            bias=bias,
        )

    pad = (-w.shape[1]) % pad_to
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    q, scale = quantize_int3(w)
    wq2, wq1 = pack_int3(q)
    return Int3Linear(
        wq2=wq2,
        wq1=wq1,
        scales=np.ascontiguousarray(scale).astype(jnp.bfloat16),
        bias=bias,
    )


def to_int3(layer: VQLinear) -> Int3Linear:
    """Exact dequant → per-(row, 128-col) int3 plane re-encode."""
    return _encode_int3(_exact_weight(layer), layer.bias)


def int3_from_q(q, scales, bias=None, pad_to: int = 2048) -> Int3Linear:
    """Build an Int3Linear from precomputed (q, scales) — calibrated
    encoder entry point (quant/gptq.py bits=3). ``q``: (out, in) int8
    in [-4, 3], ``in % 128 == 0``; ``scales``: (out, in // 128) f32."""
    import numpy as np

    from vptq_tpu.ops.packing import pack_int3

    pad = (-q.shape[1]) % pad_to
    if pad:
        q = np.pad(q, ((0, 0), (0, pad)))
        scales = np.pad(
            scales, ((0, 0), (0, pad // 128)), constant_values=1.0
        )
    wq2, wq1 = pack_int3(np.ascontiguousarray(q))
    return Int3Linear(
        wq2=wq2,
        wq1=wq1,
        scales=np.ascontiguousarray(scales).astype(jnp.bfloat16),
        bias=bias,
    )


def int2_weight(layer: Int2Linear) -> "np.ndarray":
    """Exact f32 dequant of the plane-packed int2 layout (host)."""
    import jax
    import numpy as np

    from vptq_tpu.ops.packing import unpack_int2

    q = unpack_int2(np.asarray(jax.device_get(layer.wq)))
    s = np.asarray(jax.device_get(layer.scales), np.float32)
    group = layer.group
    return (
        (q.astype(np.float32) + 0.5).reshape(q.shape[0], -1, group)
        * s[:, :, None]
    ).reshape(q.shape)


def _encode_int2(
    w, bias, shards: int = 1, pad_to: int = 1024, group: int = 64
) -> Int2Linear:
    """f32 (out, in) numpy weight → plane-packed Int2Linear.

    ``shards > 1``: blocked layout for shard_map TP (per-shard
    padding to 1024 — the kernel's W2_BLOCK minimum)."""
    import numpy as np

    from vptq_tpu.ops.packing import pack_int2, quantize_int2

    if shards > 1:
        pad = (-w.shape[1]) % shards
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)))
        blk = w.shape[1] // shards
        parts = [
            _encode_int2(
                w[:, s * blk: (s + 1) * blk], None,
                pad_to=1024, group=group,
            )
            for s in range(shards)
        ]
        return Int2Linear(
            wq=np.concatenate([p.wq for p in parts], axis=1),
            scales=np.concatenate([p.scales for p in parts], axis=1),
            bias=bias,
        )

    from vptq_tpu import native

    pad = (-w.shape[1]) % pad_to
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    got = (
        native.int2_group_quant(
            np.ascontiguousarray(w, np.float32), group
        )
        if native.available()
        else None
    )
    if got is not None:
        q, scale = got
    else:
        q, scale = quantize_int2(w, group=group)
    return Int2Linear(
        wq=pack_int2(q),
        scales=np.ascontiguousarray(scale).astype(jnp.bfloat16),
        bias=bias,
    )


def to_int2(layer: VQLinear) -> Int2Linear:
    """Exact dequant → per-(row, 64-col) half-offset int2 re-encode."""
    return _encode_int2(_exact_weight(layer), layer.bias)


def int2_from_q(
    q, scales, bias=None, pad_to: int = 1024, group: int = 64
) -> Int2Linear:
    """Build an Int2Linear from precomputed (q, scales) — calibrated
    encoder entry point (quant/gptq.py bits=2). ``q``: (out, in) int8
    in [-2, 1] (levels ``(q + 0.5) * s``), ``in % group == 0``;
    ``scales``: (out, in // group) f32."""
    import numpy as np

    from vptq_tpu.ops.packing import pack_int2

    pad = (-q.shape[1]) % pad_to
    if pad:
        # padded columns: code -1 dequants to -0.5*s; harmless (the
        # runtime zero-pads x) but keep scales finite/bf16-exact
        q = np.pad(q, ((0, 0), (0, pad)), constant_values=-1)
        scales = np.pad(
            scales, ((0, 0), (0, pad // group)), constant_values=1.0
        )
    return Int2Linear(
        wq=pack_int2(np.ascontiguousarray(q)),
        scales=np.ascontiguousarray(scales).astype(jnp.bfloat16),
        bias=bias,
    )


def linear_exact_weight(layer, logical_in: Optional[int] = None):
    """Exact f32 host dequant of ANY linear, sliced to the logical
    in_features (drops encoder zero-padding)."""
    import jax
    import numpy as np

    if isinstance(layer, VQLinear):
        w = _exact_weight(layer)
    elif isinstance(layer, Int8Linear):
        w = int8_weight(layer)
    elif isinstance(layer, Int4Linear):
        w = int4_weight(layer)
    elif isinstance(layer, Int3Linear):
        w = int3_weight(layer)
    elif isinstance(layer, Int2Linear):
        w = int2_weight(layer)
    else:  # DenseLinear
        w = np.asarray(jax.device_get(layer.weight), np.float32)
    if logical_in is not None:
        w = w[:, :logical_in]
    return w


def absorb_mla(attn, cfg, dtype=jnp.bfloat16):
    """Absorb an MLA layer's kv_b up-projections into uk/uv.

    Attention then runs entirely in the compressed-latent space
    (models/llama.py _mla_attention): the cache stores kv_lora+rope
    dims per token instead of per-head expansions, and kv_b_proj is
    dropped from the runtime pytree. Host-side, one-time; exact up
    to the bf16 rounding of the absorbed matrices.
    """
    import numpy as np

    if attn.uk is not None:
        return attn
    nh = cfg.num_attention_heads
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    w = linear_exact_weight(attn.kv_b_proj, cfg.kv_lora_rank)
    w = w.reshape(nh, dn + dv, cfg.kv_lora_rank)
    uk = np.ascontiguousarray(
        w[:, :dn, :].transpose(2, 0, 1)
    ).astype(dtype)  # (kv_lora, nh, dn)
    uv = np.ascontiguousarray(
        w[:, dn:, :].transpose(2, 0, 1)
    ).astype(dtype)  # (kv_lora, nh, dv)
    return attn.replace(kv_b_proj=None, uk=uk, uv=uv)


def to_bf16(layer: VQLinear) -> DenseLinear:
    w = _exact_weight(layer)
    return DenseLinear(
        weight=w.astype(jnp.bfloat16), bias=layer.bias
    )


def to_runtime(layer, fmt: str, row_shards: int = 1):
    """Convert any linear to the requested runtime format.

    ``row_shards > 1``: encode the in axis in BLOCKED form for
    shard_map tensor parallelism (parallel/tp.py) — used by the
    loader for row-parallel layers (o_proj / down_proj) so each
    shard is quantized once, directly from the exact weights.
    """
    if fmt not in RUNTIME_FORMATS:
        raise ValueError(f"unknown runtime format {fmt!r}")
    if not isinstance(layer, VQLinear):
        return layer  # dense stays dense
    if fmt == "codebook":
        if row_shards > 1:
            raise NotImplementedError(
                "codebook format under shard_map TP: use the GSPMD "
                "path (XLA partitions the gather fallback natively)"
            )
        return layer
    if fmt == "int8":
        if row_shards > 1:
            return _encode_int8(
                _exact_weight(layer), layer.bias, shards=row_shards
            )
        return to_int8(layer)
    if fmt == "int4":
        if row_shards > 1:
            return _encode_int4(
                _exact_weight(layer), layer.bias, shards=row_shards
            )
        return to_int4(layer)
    if fmt == "int3":
        if row_shards > 1:
            return _encode_int3(
                _exact_weight(layer), layer.bias, shards=row_shards
            )
        return to_int3(layer)
    if fmt == "int2":
        if row_shards > 1:
            return _encode_int2(
                _exact_weight(layer), layer.bias, shards=row_shards
            )
        return to_int2(layer)
    return to_bf16(layer)


def _xp_of(*arrs):
    """numpy when every given array is host-side, else jnp.

    The encoders above return host arrays; fusing/stacking them must
    stay on host (a jnp op would upload to the default device and
    defeat sharded placement). Tests that build runtime layers from
    device arrays keep working through the jnp branch.
    """
    import numpy as np

    for a in arrs:
        if a is not None and not isinstance(a, np.ndarray):
            return jnp
    return np


def fuse_linears(linears):
    """Concatenate same-input linears into one (row-wise).

    Halves kernel-dispatch count on the hot path (q|k|v and gate|up
    become single matmuls). All inputs must share in_features, type,
    and (for int8) scale group.
    """
    import numpy as np

    first = linears[0]
    if any(type(m) is not type(first) for m in linears):
        return None
    if isinstance(first, Int8Linear):
        if any(
            m.wq.shape[1] != first.wq.shape[1]
            or m.group != first.group
            for m in linears
        ):
            return None
        xp = _xp_of(*(m.wq for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int8Linear(
            wq=xp.concatenate([m.wq for m in linears], axis=0),
            scales=xp.concatenate(
                [m.scales for m in linears], axis=1
            ),
            bias=bias,
        )
    if isinstance(first, Int4Linear):
        if any(m.wq.shape[1] != first.wq.shape[1] for m in linears):
            return None
        xp = _xp_of(*(m.wq for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int4Linear(
            wq=xp.concatenate([m.wq for m in linears], axis=0),
            scales=xp.concatenate([m.scales for m in linears], axis=1),
            bias=bias,
        )
    if isinstance(first, Int3Linear):
        # every array of Int3Linear is row-major over out_features,
        # so fusion is plain row concatenation
        if any(m.wq2.shape[1] != first.wq2.shape[1] for m in linears):
            return None
        xp = _xp_of(*(m.wq2 for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int3Linear(
            wq2=xp.concatenate([m.wq2 for m in linears], axis=0),
            wq1=xp.concatenate([m.wq1 for m in linears], axis=0),
            scales=xp.concatenate(
                [m.scales for m in linears], axis=0
            ),
            bias=bias,
        )
    if isinstance(first, Int2Linear):
        # every array of Int2Linear is row-major over out_features,
        # so fusion is plain row concatenation
        if any(
            m.wq.shape[1] != first.wq.shape[1]
            or m.scales.shape[1] != first.scales.shape[1]
            for m in linears
        ):
            return None
        xp = _xp_of(*(m.wq for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int2Linear(
            wq=xp.concatenate([m.wq for m in linears], axis=0),
            scales=xp.concatenate(
                [m.scales for m in linears], axis=0
            ),
            bias=bias,
        )
    if isinstance(first, Int2MixedLinear):
        idx0 = np.asarray(first.col_idx)
        if any(
            np.asarray(m.col_idx).shape != idx0.shape
            or not np.array_equal(np.asarray(m.col_idx), idx0)
            for m in linears[1:]
        ):
            return None
        f2 = fuse_linears([m.int2 for m in linears])
        f8 = fuse_linears([m.int8 for m in linears])
        if f2 is None or f8 is None:
            return None
        xp = _xp_of(*(m.int2.wq for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int2MixedLinear(
            int2=f2, int8=f8, col_idx=first.col_idx, bias=bias
        )
    if isinstance(first, Int3MixedLinear):
        # fusable only when the site shared ONE column selection (the
        # calibrated encoder picks per site, so q|k|v / gate|up match)
        idx0 = np.asarray(first.col_idx)
        if any(
            np.asarray(m.col_idx).shape != idx0.shape
            or not np.array_equal(np.asarray(m.col_idx), idx0)
            for m in linears[1:]
        ):
            return None
        f3 = fuse_linears([m.int3 for m in linears])
        f8 = fuse_linears([m.int8 for m in linears])
        if f3 is None or f8 is None:
            return None
        xp = _xp_of(*(m.int3.wq2 for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, jnp.float32)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return Int3MixedLinear(
            int3=f3, int8=f8, col_idx=first.col_idx, bias=bias
        )
    if isinstance(first, DenseLinear):
        if any(m.weight.shape[1] != first.weight.shape[1] for m in linears):
            return None
        xp = _xp_of(*(m.weight for m in linears))
        biases = [m.bias for m in linears]
        if any(b is not None for b in biases):
            bias = xp.concatenate(
                [
                    b
                    if b is not None
                    else xp.zeros(m.out_features, m.weight.dtype)
                    for b, m in zip(biases, linears)
                ]
            )
        else:
            bias = None
        return DenseLinear(
            weight=xp.concatenate([m.weight for m in linears], axis=0),
            bias=bias,
        )
    return None  # codebook layers are not fused


def _fuse_expert(mlp):
    """Fuse one expert Mlp's gate|up (returns possibly-new Mlp)."""
    from vptq_tpu.models.llama import Mlp

    if mlp.gate_up_proj is not None or mlp.gate_proj is None:
        return mlp
    fused = fuse_linears([mlp.gate_proj, mlp.up_proj])
    if fused is None:
        return mlp
    return Mlp(
        gate_proj=None, up_proj=None,
        down_proj=mlp.down_proj, gate_up_proj=fused,
    )


def stack_experts(experts):
    """Build the MoE decode fast-path weights (StackedExperts), or
    None when the experts are not a uniform Int8Linear/Int4Linear
    family."""
    from vptq_tpu.models.llama import StackedExperts

    gus = [e.gate_up_proj for e in experts]
    downs = [e.down_proj for e in experts]
    if all(isinstance(m, Int4Linear) for m in gus + downs):
        fmt = "int4"
    elif all(isinstance(m, Int8Linear) for m in gus + downs):
        fmt = "int8"
    else:
        return None
    if any(m.bias is not None for m in gus + downs):
        return None
    gu0, d0 = gus[0], downs[0]
    if any(
        m.wq.shape != gu0.wq.shape or m.scales.shape != gu0.scales.shape
        for m in gus
    ):
        return None
    if any(
        m.wq.shape != d0.wq.shape or m.scales.shape != d0.scales.shape
        for m in downs
    ):
        return None
    xp = _xp_of(*(m.wq for m in gus + downs))
    return StackedExperts(
        gate_up_wq=xp.stack([m.wq for m in gus]),
        gate_up_scales=xp.stack([m.scales for m in gus]),
        down_wq=xp.stack([m.wq for m in downs]),
        down_scales=xp.stack([m.scales for m in downs]),
        fmt=fmt,
    )


def fuse_block(block):
    """Fuse one block's q|k|v and gate|up projections; stack MoE
    experts for the selected-experts decode fast path."""
    from vptq_tpu.models.llama import (
        Attention,
        Block,
        DeepseekMoe,
        Mlp,
        MoeMlp,
    )

    attn, mlp = block.attn, block.mlp
    if (
        isinstance(attn, Attention)
        and attn.qkv_proj is None
        and attn.q_proj is not None
    ):
        fused = fuse_linears(
            [attn.q_proj, attn.k_proj, attn.v_proj]
        )
        if fused is not None:
            attn = Attention(
                q_proj=None, k_proj=None, v_proj=None,
                o_proj=attn.o_proj, qkv_proj=fused,
            )
    if (
        isinstance(mlp, Mlp)
        and mlp.gate_up_proj is None
        and mlp.gate_proj is not None
    ):
        fused = fuse_linears([mlp.gate_proj, mlp.up_proj])
        if fused is not None:
            mlp = Mlp(
                gate_proj=None, up_proj=None,
                down_proj=mlp.down_proj, gate_up_proj=fused,
            )
    if isinstance(mlp, MoeMlp):
        experts = tuple(_fuse_expert(e) for e in mlp.experts)
        stacked = stack_experts(experts)
        # stacked built => drop the per-expert copies so expert
        # weights exist ONCE in HBM (both the dense all-experts
        # path and the selected-experts fast path read the
        # stacked arrays)
        mlp = MoeMlp(
            router=mlp.router,
            experts=() if stacked is not None else experts,
            num_experts_per_tok=mlp.num_experts_per_tok,
            stacked=stacked,
        )
    elif isinstance(mlp, DeepseekMoe):
        experts = tuple(_fuse_expert(e) for e in mlp.experts)
        stacked = stack_experts(experts)
        mlp = DeepseekMoe(
            router_weight=mlp.router_weight,
            correction_bias=mlp.correction_bias,
            experts=() if stacked is not None else experts,
            shared_experts=_fuse_expert(mlp.shared_experts),
            top_k=mlp.top_k,
            n_group=mlp.n_group,
            topk_group=mlp.topk_group,
            norm_topk_prob=mlp.norm_topk_prob,
            routed_scaling_factor=mlp.routed_scaling_factor,
            stacked=stacked,
        )
    return Block(
        input_layernorm=block.input_layernorm,
        attn=attn,
        post_attention_layernorm=block.post_attention_layernorm,
        mlp=mlp,
    )


def fuse_model(model):
    """Fuse q|k|v and gate|up projections across all blocks; stack
    int8 MoE experts for the selected-experts decode fast path."""
    from vptq_tpu.models.llama import Model

    return Model(
        embed_tokens=model.embed_tokens,
        blocks=tuple(fuse_block(b) for b in model.blocks),
        norm=model.norm,
        lm_head=model.lm_head,
        cfg=model.cfg,
    )
