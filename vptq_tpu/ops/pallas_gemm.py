"""Pallas TPU kernels: fused group-dequant matmul (w8a16 / bf16).

Design rationale (measured on a v5e chip, see ARCHITECTURE.md):

The reference's CUDA kernels do per-thread random gathers from a
shared-memory codebook (reference csrc/kernels/quant_gemv_v2.cuh:84-151).
TPU vector hardware has no equivalent: ``tpu.dynamic_gather`` handles
only 8-sublane tables, and XLA's gather runs at ~0.36 G ids/s — three
orders of magnitude short of what decode needs. The TPU-native design
therefore re-encodes the VPTQ weights **once at ingestion** into a
dense runtime format (int8 + per-group scales, or bf16), and the hot
kernel is a fused dequant-matmul whose weight tiles go straight from
HBM through VMEM into the MXU — never materializing the bf16 weight
matrix in HBM.

One kernel serves both decode (token-skinny x) and prefill (wide x),
replacing the reference's two-path GEMV/GEMM split
(reference vptq/ops/quant_gemm.py:213-275).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Interpreter mode lets the kernels run (slowly) on CPU — used by
    # the test-suite to validate kernel semantics off-TPU.
    return os.environ.get("VPTQ_TPU_PALLAS_INTERPRET", "0") == "1"

__all__ = [
    "w8_matmul",
    "w3_matmul",
    "w2_matmul",
    "w8_matmul_expert",
    "w8_matmul_pairs",
    "w4_matmul",
    "w4_matmul_pairs",
    "bf16_matmul",
]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _w8_kernel(
    x_ref, w_ref, s_ref, o_ref, acc_ref,
    *, n_in_tiles: int, tiles_per_group: int,
):
    """One (token_tile, out_tile, in_tile) grid step.

    x_ref: (T_T, I_T) bf16; w_ref: (O_T, I_T) int8;
    s_ref: (n_groups, O_T) f32 — per-(in-group, row) scales; the scale
    group is ``tiles_per_group * I_T`` input columns (all groups
    resident; the row for step j is ``j // tiles_per_group``);
    o_ref: (T_T, O_T) out dtype; acc_ref: (T_T, O_T) f32 scratch.
    """
    j = pl.program_id(2)

    w = w_ref[:].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part = part * s_ref[j // tiles_per_group, :][None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w8_matmul(
    x: jnp.ndarray,  # (..., IN) bf16/f32
    wq: jnp.ndarray,  # (OUT, IN) int8
    scales: jnp.ndarray,  # (IN // group, OUT) f32, group == in_tile
    *,
    out_tile: int = 256,
    in_tile: int = 512,
    out_dtype=None,
) -> jnp.ndarray:
    """Compute ``x @ (scales ⊙ wq)^T`` with tile-fused dequant.

    ``scales[g, o]`` scales weight rows ``o`` for input columns in
    group ``g``; the scale group must be a multiple of ``in_tile``.
    """
    out_features, in_features = wq.shape
    if in_features % in_tile:
        raise ValueError(f"in_features {in_features} % {in_tile} != 0")
    n_groups = scales.shape[0]
    if scales.shape[1] != out_features or in_features % n_groups:
        raise ValueError(f"scales shape {scales.shape} mismatch")
    group = in_features // n_groups
    if group % in_tile:
        raise ValueError(
            f"scale group {group} must be a multiple of in_tile {in_tile}"
        )
    tiles_per_group = group // in_tile

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)

    # pad the token dim to the bf16 sublane tile; beyond one token
    # tile (512 — the VMEM budget: x + f32 accumulator + out all hold
    # a full token tile), round up to a multiple of the tile and add a
    # token grid dimension
    t_tile = min(_round_up(max(tokens, 1), 16), 512)
    t_pad = _round_up(max(tokens, 1), t_tile)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    # out_features need NOT be a multiple of out_tile: the out dim is
    # purely parallel, so Pallas's partial-boundary blocks only affect
    # output rows that are sliced off below. (Padding the weight here
    # instead would re-copy the whole weight matrix through HBM on
    # every call — measured 3x throughput loss on lm_head shapes.)
    o_pad = _round_up(out_features, out_tile)

    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(
            _w8_kernel, n_in_tiles=n_in, tiles_per_group=tiles_per_group
        ),
        grid=(n_t, n_out, n_in),
        in_specs=[
            pl.BlockSpec(
                (t_tile, in_tile), lambda t, i, j: (t, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (out_tile, in_tile), lambda t, i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_groups, out_tile), lambda t, i, j: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_tile, out_tile), lambda t, i, j: (t, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * o_pad * in_features,
            bytes_accessed=n_t * out_features * in_features
            + t_pad * in_features * 2
            + t_pad * out_features * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2.astype(jnp.bfloat16), wq, scales)

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w8e_kernel(
    e_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
    *, n_in_tiles: int, tiles_per_group: int,
):
    """w8 grid step over ONE expert of a stacked (E, OUT, IN) weight.

    The expert id arrives via scalar prefetch (e_ref) and drives the
    block index maps — only the selected expert's tiles are ever
    DMA'd from HBM (the TPU analogue of gather-free MoE dispatch).
    """
    j = pl.program_id(1)

    w = w_ref[0].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part = part * s_ref[0, j // tiles_per_group, :][None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w8_matmul_expert(
    x: jnp.ndarray,  # (..., IN)
    wq: jnp.ndarray,  # (E, OUT, IN) int8 — stacked experts
    scales: jnp.ndarray,  # (E, IN // group, OUT) f32
    expert: jnp.ndarray,  # () int32 — which expert
    *,
    out_tile: int = 512,
    in_tile: int = 2048,
    out_dtype=None,
) -> jnp.ndarray:
    """``x @ (scales[e] ⊙ wq[e])^T`` reading ONLY expert ``e``'s bytes.

    The MoE decode hot path: per token only the top-k experts' weights
    cross HBM (the dense fallback reads all E experts every step).
    """
    n_experts, out_features, in_features = wq.shape
    if in_features % in_tile:
        raise ValueError(f"in_features {in_features} % {in_tile} != 0")
    n_groups = scales.shape[1]
    if scales.shape != (n_experts, n_groups, out_features) or (
        in_features % n_groups
    ):
        raise ValueError(f"scales shape {scales.shape} mismatch")
    group = in_features // n_groups
    if group % in_tile:
        raise ValueError(
            f"scale group {group} must be a multiple of in_tile {in_tile}"
        )
    tiles_per_group = group // in_tile

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    t_pad = _round_up(max(tokens, 1), 16)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(
            _w8e_kernel,
            n_in_tiles=n_in,
            tiles_per_group=tiles_per_group,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_out, n_in),
            in_specs=[
                pl.BlockSpec((t_pad, in_tile), lambda i, j, e: (0, j)),
                pl.BlockSpec(
                    (1, out_tile, in_tile),
                    lambda i, j, e: (e[0], i, j),
                ),
                pl.BlockSpec(
                    (1, n_groups, out_tile),
                    lambda i, j, e: (e[0], 0, i),
                ),
            ],
            out_specs=pl.BlockSpec(
                (t_pad, out_tile), lambda i, j, e: (0, i)
            ),
            scratch_shapes=[pltpu.VMEM((t_pad, out_tile), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        expert.reshape(1).astype(jnp.int32),
        x2.astype(jnp.bfloat16),
        wq,
        scales,
    )

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w8p_kernel(
    e_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
    *, n_in_tiles: int, tiles_per_group: int,
):
    """w8 grid step for ONE (token, expert) pair of a batched MoE
    dispatch (grid dim 0 = pair index).

    The pair's expert id arrives via scalar prefetch and drives the
    weight/scale block index maps — each pair DMAs only its own
    expert's tiles. One kernel call covers ALL (token, top-k) pairs of
    a decode step, replacing the per-pair kernel dispatches of the
    round-1 ``_moe_fast`` Python loop (trace size O(1) vs O(n*k)).

    x_ref: (1, 8, I_T) bf16 — the pair's activation row, broadcast to
    the 8-sublane tile Mosaic requires (sublanes 1-7 are padding);
    w_ref: (1, O_T, I_T) int8; s_ref: (1, n_groups, O_T) f32;
    o_ref: (1, 8, O_T); acc_ref: (8, O_T) f32.
    """
    j = pl.program_id(2)

    w = w_ref[0].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x_ref[0],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part = part * s_ref[0, j // tiles_per_group, :][None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w8_matmul_pairs(
    x: jnp.ndarray,  # (P, IN) — one activation row per (token, k) pair
    wq: jnp.ndarray,  # (E, OUT, IN) int8 — stacked experts
    scales: jnp.ndarray,  # (E, IN // group, OUT) f32
    experts: jnp.ndarray,  # (P,) int32 — expert id per pair
    *,
    out_tile: int = 512,
    in_tile: int = 2048,
    out_dtype=None,
) -> jnp.ndarray:
    """Per-pair expert matmul: ``out[p] = x[p] @ (s[e_p] ⊙ wq[e_p])^T``.

    The batched MoE decode hot path: every (token, top-k) pair reads
    exactly its expert's bytes from HBM, in one kernel dispatch.
    """
    n_experts, out_features, in_features = wq.shape
    if in_features % in_tile:
        raise ValueError(f"in_features {in_features} % {in_tile} != 0")
    n_groups = scales.shape[1]
    if scales.shape != (n_experts, n_groups, out_features) or (
        in_features % n_groups
    ):
        raise ValueError(f"scales shape {scales.shape} mismatch")
    group = in_features // n_groups
    if group % in_tile:
        raise ValueError(
            f"scale group {group} must be a multiple of in_tile {in_tile}"
        )
    tiles_per_group = group // in_tile

    n_pairs = x.shape[0]
    # (P, 8, IN): Mosaic needs 8-divisible (or full) sublane blocks, so
    # each pair's row is broadcast onto an 8-sublane tile (decode MXU
    # utilization is irrelevant — the op is weight-bandwidth-bound)
    x3 = jnp.broadcast_to(
        x.astype(jnp.bfloat16)[:, None, :], (n_pairs, 8, in_features)
    )

    o_pad = _round_up(out_features, out_tile)
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(
            _w8p_kernel,
            n_in_tiles=n_in,
            tiles_per_group=tiles_per_group,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pairs, n_out, n_in),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, in_tile), lambda p, i, j, e: (p, 0, j)
                ),
                pl.BlockSpec(
                    (1, out_tile, in_tile),
                    lambda p, i, j, e: (e[p], i, j),
                ),
                pl.BlockSpec(
                    (1, n_groups, out_tile),
                    lambda p, i, j, e: (e[p], 0, i),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, out_tile), lambda p, i, j, e: (p, 0, i)
            ),
            scratch_shapes=[pltpu.VMEM((8, out_tile), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pairs, 8, out_features), out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(experts.astype(jnp.int32), x3, wq, scales)

    return out[:, 0, :]


W4_GROUP = 128  # int4 scale-group width along in_features


def _w4_kernel(
    xl_ref, xh_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref,
    *, n_in_tiles: int, s_half: int,
):
    """One int4 (out_tile, in_tile) grid step.

    Nibble layout (set by pack_int4): byte ``w[o, k]`` holds natural
    column ``k`` in its low nibble and column ``in_p/2 + k`` in its
    high nibble, so unpacking is two shifts — no lane shuffles. The
    two half-tiles contract against two x slices (xl/xh) fetched from
    opposite halves of the input. Per-(row, 128-col-subgroup) scales
    are applied on the partial accumulator of per-subgroup K=128
    sub-dots. The SAME scale array arrives through two BlockSpecs
    whose index maps deliver this step's lo-half rows (sl) and
    hi-half rows (sh) — zero-copy, no in-kernel dynamic slicing,
    which lifts the old in_tile ≥ 2048 alignment floor down to 256.

    xl/xh: (T, I_T/2) bf16; w_ref: (O_T, I_T/2) int8 (packed);
    sl/sh_ref: (s_half, O_T) bf16; o_ref: (T_T, O_T);
    acc_ref: (T_T, O_T) f32.
    """
    j = pl.program_id(2)

    # nibble extraction in i32 — Mosaic legalizes vector shifts only
    # at i32 (i8/i16 shifts fail to lower). The low nibble needs ONE
    # shift, not two: (w << 28) is exactly lo * 2^28 (zero bits below
    # the nibble), its bf16 conversion is exact, and the 2^-28 folds
    # into the low-half scale rows for free (examples/w4_unpack_ablation.py:
    # +2-6% over the two-shift form; measured VPU-bound ceiling of any
    # unpack+scale structure is ~600-620 GB/s vs ~700 for a
    # convert-only stream — see ARCHITECTURE.md).
    w = w_ref[:].astype(jnp.int32)
    lo = jnp.left_shift(w, 28)  # lo * 2^28, sign carried by the shift
    hi = jnp.right_shift(w, 4)  # arithmetic: sign-extended high

    sl = sl_ref[:].astype(jnp.float32) * jnp.float32(2.0 ** -28)
    sh = sh_ref[:]

    dims = (((1,), (1,)), ((), ()))
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(s_half):
        c0, c1 = sub * W4_GROUP, (sub + 1) * W4_GROUP
        pl_ = jax.lax.dot_general(
            xl_ref[:, c0:c1], lo[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        ph_ = jax.lax.dot_general(
            xh_ref[:, c0:c1], hi[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        part = part + pl_ * sl[sub, :][None, :]
        part = part + ph_ * sh[sub, :].astype(jnp.float32)[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w4_matmul(
    x: jnp.ndarray,  # (..., IN) bf16/f32, IN == in_p (padded)
    wq: jnp.ndarray,  # (OUT, IN // 2) int8 — packed nibbles
    scales: jnp.ndarray,  # (IN // 128, OUT) bf16 (transposed layout)
    *,
    out_tile: int = 512,
    in_tile: int = 2048,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused int4 dequant-matmul: ``x @ (scalesᵀ ⊙ unpack(wq))^T``.

    Weight layout contract is :func:`vptq_tpu.ops.packing.pack_int4`.
    ``in_tile`` counts natural (unpacked) input columns and must divide
    ``IN``; the packed tile streamed per grid step is ``in_tile/2``
    bytes wide.
    """
    out_features = wq.shape[0]
    in_features = wq.shape[1] * 2
    if x.shape[-1] != in_features:
        raise ValueError(
            f"x last dim {x.shape[-1]} != padded in_features {in_features}"
        )
    if in_features % in_tile:
        raise ValueError(
            f"in_features {in_features} % in_tile {in_tile} != 0"
        )
    if in_tile % (2 * W4_GROUP):
        raise ValueError(f"in_tile {in_tile} % {2*W4_GROUP} != 0")
    if scales.shape != (in_features // W4_GROUP, out_features):
        raise ValueError(f"scales shape {scales.shape} mismatch")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    t_tile = min(_round_up(max(tokens, 1), 16), 512)
    t_pad = _round_up(max(tokens, 1), t_tile)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    half = in_tile // 2
    s_half = half // W4_GROUP
    out_dtype = out_dtype or x.dtype

    # The scale array is passed TWICE with different index maps: one
    # BlockSpec delivers this step's lo-half rows, the other its
    # hi-half rows (offset n_in blocks = S/2 rows) — zero-copy, and
    # only 2*s_half rows resident per step instead of all S.
    out = pl.pallas_call(
        functools.partial(
            _w4_kernel, n_in_tiles=n_in, s_half=s_half
        ),
        grid=(n_t, n_out, n_in),
        in_specs=[
            pl.BlockSpec(  # x low half
                (t_tile, half), lambda t, i, j: (t, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # x high half
                (t_tile, half), lambda t, i, j: (t, j + n_in),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # packed weights
                (out_tile, half), lambda t, i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # lo-half scale rows of step j
                (s_half, out_tile), lambda t, i, j: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # hi-half scale rows of step j
                (s_half, out_tile), lambda t, i, j: (j + n_in, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_tile, out_tile), lambda t, i, j: (t, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * o_pad * in_features,
            bytes_accessed=out_features * in_features // 2
            + out_features * (in_features // W4_GROUP) * 2
            + t_pad * in_features * 2
            + t_pad * out_features * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        x2.astype(jnp.bfloat16),
        x2.astype(jnp.bfloat16),
        wq,
        scales.astype(jnp.bfloat16),
        scales.astype(jnp.bfloat16),
    )

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w4e_kernel(
    e_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref, acc_ref,
    *, n_in_tiles: int, s_half: int,
):
    """int4 grid step over ONE expert of stacked (E, OUT, IN/2) nibble
    weights — expert id via scalar prefetch (see _w8e_kernel)."""
    j = pl.program_id(1)

    w = w_ref[0].astype(jnp.int32)
    lo = jnp.left_shift(w, 28)  # lo * 2^28 (see _w4_kernel)
    hi = jnp.right_shift(w, 4)

    n_scale_rows = s_ref.shape[1]
    sl = s_ref[0, pl.ds(j * s_half, s_half), :].astype(
        jnp.float32
    ) * jnp.float32(2.0 ** -28)  # (s_half, O_T)
    sh = s_ref[0, pl.ds(n_scale_rows // 2 + j * s_half, s_half), :]

    dims = (((1,), (1,)), ((), ()))
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(s_half):
        c0, c1 = sub * W4_GROUP, (sub + 1) * W4_GROUP
        pl_ = jax.lax.dot_general(
            xl_ref[:, c0:c1], lo[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        ph_ = jax.lax.dot_general(
            xh_ref[:, c0:c1], hi[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        part = part + pl_ * sl[sub, :][None, :]
        part = part + ph_ * sh[sub, :].astype(jnp.float32)[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w4_matmul_expert(
    x: jnp.ndarray,  # (..., IN)
    wq: jnp.ndarray,  # (E, OUT, IN // 2) int8 — stacked packed nibbles
    scales: jnp.ndarray,  # (E, IN // 128, OUT) bf16
    expert: jnp.ndarray,  # () int32
    *,
    out_tile: int = 512,
    in_tile: int = 2048,
    out_dtype=None,
) -> jnp.ndarray:
    """int4 expert matmul reading ONLY expert ``e``'s bytes (the MoE
    decode hot path in the int4 runtime format)."""
    n_experts, out_features = wq.shape[0], wq.shape[1]
    in_features = wq.shape[2] * 2
    if x.shape[-1] != in_features:
        raise ValueError(
            f"x last dim {x.shape[-1]} != padded in_features {in_features}"
        )
    if in_features % in_tile:
        raise ValueError(
            f"in_features {in_features} % in_tile {in_tile} != 0"
        )
    if in_tile % (2 * W4_GROUP) or (in_tile // 256) % 8:
        raise ValueError(f"in_tile {in_tile} unsupported (use 2048)")
    if scales.shape != (
        n_experts, in_features // W4_GROUP, out_features
    ):
        raise ValueError(f"scales shape {scales.shape} mismatch")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    t_pad = _round_up(max(tokens, 1), 16)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    half = in_tile // 2
    s_half = half // W4_GROUP
    n_scale_rows = in_features // W4_GROUP
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(
            _w4e_kernel, n_in_tiles=n_in, s_half=s_half
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_out, n_in),
            in_specs=[
                pl.BlockSpec((t_pad, half), lambda i, j, e: (0, j)),
                pl.BlockSpec(
                    (t_pad, half), lambda i, j, e: (0, j + n_in)
                ),
                pl.BlockSpec(
                    (1, out_tile, half),
                    lambda i, j, e: (e[0], i, j),
                ),
                pl.BlockSpec(
                    (1, n_scale_rows, out_tile),
                    lambda i, j, e: (e[0], 0, i),
                ),
            ],
            out_specs=pl.BlockSpec(
                (t_pad, out_tile), lambda i, j, e: (0, i)
            ),
            scratch_shapes=[pltpu.VMEM((t_pad, out_tile), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        expert.reshape(1).astype(jnp.int32),
        x2.astype(jnp.bfloat16),
        x2.astype(jnp.bfloat16),
        wq,
        scales.astype(jnp.bfloat16),
    )

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w4p_kernel(
    e_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref, acc_ref,
    *, n_in_tiles: int, s_half: int,
):
    """int4 grid step for ONE (token, expert) pair (see _w8p_kernel;
    nibble layout and scale slicing as in _w4e_kernel)."""
    j = pl.program_id(2)

    w = w_ref[0].astype(jnp.int32)
    lo = jnp.left_shift(w, 28)  # lo * 2^28 (see _w4_kernel)
    hi = jnp.right_shift(w, 4)

    n_scale_rows = s_ref.shape[1]
    sl = s_ref[0, pl.ds(j * s_half, s_half), :].astype(
        jnp.float32
    ) * jnp.float32(2.0 ** -28)
    sh = s_ref[0, pl.ds(n_scale_rows // 2 + j * s_half, s_half), :]

    dims = (((1,), (1,)), ((), ()))
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(s_half):
        c0, c1 = sub * W4_GROUP, (sub + 1) * W4_GROUP
        pl_ = jax.lax.dot_general(
            xl_ref[0][:, c0:c1], lo[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        ph_ = jax.lax.dot_general(
            xh_ref[0][:, c0:c1], hi[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        part = part + pl_ * sl[sub, :][None, :]
        part = part + ph_ * sh[sub, :].astype(jnp.float32)[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w4_matmul_pairs(
    x: jnp.ndarray,  # (P, IN)
    wq: jnp.ndarray,  # (E, OUT, IN // 2) int8 — stacked packed nibbles
    scales: jnp.ndarray,  # (E, IN // 128, OUT) bf16
    experts: jnp.ndarray,  # (P,) int32
    *,
    out_tile: int = 512,
    in_tile: int = 2048,
    out_dtype=None,
) -> jnp.ndarray:
    """int4 per-pair expert matmul (batched MoE decode, one dispatch
    for all (token, top-k) pairs — see w8_matmul_pairs)."""
    n_experts, out_features = wq.shape[0], wq.shape[1]
    in_features = wq.shape[2] * 2
    if x.shape[-1] != in_features:
        raise ValueError(
            f"x last dim {x.shape[-1]} != padded in_features {in_features}"
        )
    if in_features % in_tile:
        raise ValueError(
            f"in_features {in_features} % in_tile {in_tile} != 0"
        )
    if in_tile % (2 * W4_GROUP) or (in_tile // 256) % 8:
        raise ValueError(f"in_tile {in_tile} unsupported (use 2048)")
    if scales.shape != (
        n_experts, in_features // W4_GROUP, out_features
    ):
        raise ValueError(f"scales shape {scales.shape} mismatch")

    n_pairs = x.shape[0]
    x3 = jnp.broadcast_to(
        x.astype(jnp.bfloat16)[:, None, :], (n_pairs, 8, in_features)
    )

    o_pad = _round_up(out_features, out_tile)
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    half = in_tile // 2
    s_half = half // W4_GROUP
    n_scale_rows = in_features // W4_GROUP
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(
            _w4p_kernel, n_in_tiles=n_in, s_half=s_half
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pairs, n_out, n_in),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, half), lambda p, i, j, e: (p, 0, j)
                ),
                pl.BlockSpec(
                    (1, 8, half), lambda p, i, j, e: (p, 0, j + n_in)
                ),
                pl.BlockSpec(
                    (1, out_tile, half),
                    lambda p, i, j, e: (e[p], i, j),
                ),
                pl.BlockSpec(
                    (1, n_scale_rows, out_tile),
                    lambda p, i, j, e: (e[p], 0, i),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, out_tile), lambda p, i, j, e: (p, 0, i)
            ),
            scratch_shapes=[pltpu.VMEM((8, out_tile), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pairs, 8, out_features), out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        experts.astype(jnp.int32),
        x3,
        x3,
        wq,
        scales.astype(jnp.bfloat16),
    )

    return out[:, 0, :]


def _bf16_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_in_tiles: int):
    j = pl.program_id(1)
    part = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def bf16_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,  # (OUT, IN) bf16
    *,
    out_tile: int = 256,
    in_tile: int = 512,
    out_dtype=None,
) -> jnp.ndarray:
    """Tiled ``x @ w^T`` (the exact-parity runtime format)."""
    out_features, in_features = w.shape
    if in_features % in_tile:
        raise ValueError(f"in_features {in_features} % {in_tile} != 0")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    t_pad = _round_up(max(tokens, 1), 16)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))
    # out dim is parallel — no weight pad needed (see w8_matmul)
    o_pad = _round_up(out_features, out_tile)
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(_bf16_kernel, n_in_tiles=n_in),
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec(
                (t_pad, in_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (out_tile, in_tile), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_pad, out_tile), lambda i, j: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_pad, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x2.astype(w.dtype), w)

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w2_kernel(*refs, n_in_tiles: int, s_q: int, group: int):
    """One int2 (out_tile, in_tile) grid step.

    Plane layout (packing.pack_int2): one (out, in/4) byte plane, 4
    quarter-split 2-bit two's-complement codes per byte. Dequant is
    ``w = (c + 0.5) * s`` (half-offset symmetric grid). Extraction
    per quarter uses whole-vector i32 shifts and NO mask:
    ``c = (w << (30 - 2q)) >> 30`` — the left shift parks the field's
    sign bit at bit 31 and the arithmetic right shift floor-divides
    the lower contaminating fields away (exact: they are
    non-negative). Quarter 0 is ONE shift (``w << 30`` = c0 * 2^30
    exactly; the 2^-30 is pre-folded into its scale rows and 2^30
    into its xg rows by the caller) and quarter 3 is one shift
    (``w >> 6``). Total: 1 i8->i32 unpack + 6 shifts + 4 bf16
    converts per byte = ~2.75 VPU ops/weight — between the w4 kernel
    (~2.5/weight) and the w3 kernel (~6/weight), at HALF w4's HBM
    bytes. Measured v5e decode: ~0.55-0.6 T weights/s (VPU-bound; a
    weight-side-scale single-dot variant measured 30% SLOWER, and
    in-kernel x group-sum reductions cost ~8% — hence the
    precomputed xg input).

    The +0.5 offset rides a per-sub-group FMA on the accumulator:
    ``x @ ((c + 0.5) s) = (x @ c) s + 0.5 s * sum_g(x)`` with the
    group sums ``xg`` computed OUTSIDE (one fused XLA reduce per
    call) and regrouped like the scale rows.

    refs: xq0..xq3 (T, I/4) bf16, w (O_T, I/4) int8, sq (4*s_q, O_T)
    bf16 (this step's quarter scale rows, regrouped outside; quarter
    0 rows pre-scaled by 2^-30), xg (T, 4*s_q) f32 (this step's
    half x group sums, quarter 0 pre-scaled by 2^30),
    o_ref (T, O_T), acc_ref (T, O_T) f32.
    """
    xq = refs[0:4]
    w_ref = refs[4]
    sq_ref = refs[5]
    xg_ref = refs[6]
    o_ref, acc_ref = refs[7], refs[8]
    j = pl.program_id(2)

    w = w_ref[:].astype(jnp.int32)

    dims = (((1,), (1,)), ((), ()))
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for q in range(4):
        if q == 0:
            c = jnp.left_shift(w, 30).astype(jnp.bfloat16)
        elif q == 3:
            c = jnp.right_shift(w, 6).astype(jnp.bfloat16)
        else:
            c = jnp.right_shift(
                jnp.left_shift(w, 30 - 2 * q), 30
            ).astype(jnp.bfloat16)
        s_rows = sq_ref[q * s_q: (q + 1) * s_q, :]
        for sub in range(s_q):
            c0, c1 = sub * group, (sub + 1) * group
            p = jax.lax.dot_general(
                xq[q][:, c0:c1], c[:, c0:c1],
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            xg = xg_ref[q * s_q + sub, :][:, None]
            part = part + (p + xg) * s_rows[sub, :].astype(
                jnp.float32
            )[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w2_matmul(
    x: jnp.ndarray,  # (..., IN) bf16/f32, IN == in_p (padded)
    wq: jnp.ndarray,  # (OUT, IN // 4) int8 — 2-bit plane
    scales: jnp.ndarray,  # (OUT, IN // group) bf16 (out-major)
    *,
    out_tile: int = 2048,
    in_tile: int = 1024,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused int2 dequant-matmul over the pack_int2 plane layout.

    The ~2-bit serving operating point (reference README.md:274-279):
    ``w = (c + 0.5) * s`` with per-(row, ``group``-col) bf16 scales.
    ``in_tile`` counts natural input columns; must divide IN and be a
    multiple of ``4 * group`` (every quarter sub-slice covers whole
    scale groups). The scale group is inferred from the array shapes
    and must be 64 or 128.
    """
    out_features = wq.shape[0]
    in_features = wq.shape[1] * 4
    if x.shape[-1] != in_features:
        raise ValueError(
            f"x last dim {x.shape[-1]} != padded in_features {in_features}"
        )
    if in_features % in_tile:
        raise ValueError(
            f"in_features {in_features} % in_tile {in_tile} != 0"
        )
    if in_features % scales.shape[1]:
        raise ValueError(f"scales shape {scales.shape} mismatch")
    group = in_features // scales.shape[1]
    if group not in (64, 128) or scales.shape[0] != out_features:
        raise ValueError(f"scales shape {scales.shape} mismatch")
    if in_tile % (4 * group):
        raise ValueError(f"in_tile {in_tile} % {4 * group} != 0")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    # token tile capped at 256 (the w3 rationale): 4 zero-copy x views
    # + f32 scratch per token tile keep the double-buffered set well
    # inside the 16 MB scoped-VMEM budget at out_tile 2048
    t_tile = min(_round_up(max(tokens, 1), 16), 256)
    t_pad = _round_up(max(tokens, 1), t_tile)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    quart = in_tile // 4
    s_q = quart // group
    out_dtype = out_dtype or x.dtype

    # x is passed 4 times with different index maps (quarter views of
    # the global split layout) — zero-copy. Scales are regrouped
    # OUTSIDE the kernel so each step's quarter rows are contiguous
    # (4*s_q >= 8 rows per step — Pallas' sublane-tiling floor needs
    # in_tile >= 512 at group=64; the packer's W2_BLOCK=1024 floor
    # guarantees it), with quarter 0's rows pre-scaled by 2^-30 (its
    # single-shift extraction leaves codes at c * 2^30). The x group
    # sums ride along transposed — (rows, T) so per-step lane slicing
    # stays 128-aligned — carrying the half-offset term with the 0.5
    # (and quarter 0's 2^30) pre-applied.
    def xq_spec(q):
        return pl.BlockSpec(
            (t_tile, quart), lambda t, i, j, q=q: (t, q * n_in + j),
            memory_space=pltpu.VMEM,
        )

    sb = scales.astype(jnp.bfloat16).T  # (S, OUT) canonical rows
    sb4 = sb.reshape(4, n_in, s_q, out_features)
    qf = jnp.asarray(
        [2.0 ** -30, 1.0, 1.0, 1.0], sb4.dtype
    ).reshape(4, 1, 1, 1)
    sq_all = (
        (sb4 * qf)
        .transpose(1, 0, 2, 3)
        .reshape(n_in * 4 * s_q, out_features)
    )
    # group sums of the SAME bf16-rounded x the kernel dots consume
    xg = jnp.sum(
        x2.astype(jnp.bfloat16)
        .astype(jnp.float32)
        .reshape(t_pad, in_features // group, group),
        axis=-1,
    )  # (T, S) canonical group sums
    gf = jnp.asarray(
        [0.5 * 2.0 ** 30, 0.5, 0.5, 0.5], jnp.float32
    ).reshape(1, 4, 1)
    xg_all = (
        (xg.reshape(t_pad, 4, n_in * s_q) * gf)
        .reshape(t_pad, 4, n_in, s_q)
        .transpose(2, 1, 3, 0)
        .reshape(n_in * 4 * s_q, t_pad)
    )

    out = pl.pallas_call(
        functools.partial(
            _w2_kernel, n_in_tiles=n_in, s_q=s_q, group=group
        ),
        grid=(n_t, n_out, n_in),
        in_specs=(
            [xq_spec(q) for q in range(4)]
            + [
                pl.BlockSpec(  # 2-bit plane
                    (out_tile, quart), lambda t, i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # quarter scale rows of step j
                    (4 * s_q, out_tile), lambda t, i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # x group-sum rows of step j
                    (4 * s_q, t_tile), lambda t, i, j: (j, t),
                    memory_space=pltpu.VMEM,
                ),
            ]
        ),
        out_specs=pl.BlockSpec(
            (t_tile, out_tile), lambda t, i, j: (t, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * o_pad * in_features,
            bytes_accessed=out_features * in_features // 4
            + out_features * (in_features // group) * 2
            + t_pad * in_features * 2
            + t_pad * out_features * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        *([x2.astype(jnp.bfloat16)] * 4),
        wq,
        sq_all,
        xg_all,
    )

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


def _w3_kernel(*refs, n_in_tiles: int, s_q: int, s_o: int):
    """One int3 (out_tile, in_tile) grid step.

    Plane layout (packing.pack_int3): ``plane2`` bytes carry 4
    quarter-split low-2-bit fields, ``plane1`` bytes 8 octant-split
    sign bits. The value decomposes as ``v = two - 4*sign``, computed
    as TWO families of K=128 sub-dots with the scale applied on the
    partial accumulator (the w4 structure):

      * quarter q: ``two = (w2 >> 2q) & 3`` (shift+mask, exact in
        bf16) against the quarter's x slice, scaled by its 128-col
        scale rows;
      * octant m: ``negsign = (w1 << (31-m)) >> 31`` (arithmetic
        shift to/from the top bit -> 0 or -1, no mask) against the
        octant's x slice, scaled by 4x the scale rows — the -4*sign
        term with the 4 folded into the scale for free.

    Measured on v5e: ~190-200 GB/s of plane traffic — VPU-bound at
    ~6 i32 ops/weight (extraction of >2 fields per byte forces
    shift+mask pairs; the int4 kernel needs only one single-shift per
    nibble half). A merged-K=1024 variant with weight-side scales
    measured 30% SLOWER (in-kernel concat + (O_T,1) broadcasts cost
    more than the extra sub-dots), so this structure stands.

    refs: xq0..xq3 (T, I/4), xo0..xo7 (T, I/8), w2 (O, I/4) int8,
    w1 (O, I/8) int8, sq (4*s_q, O) bf16 (this step's quarter scale
    rows, regrouped), so (8*s_o, O) bf16 (octant rows), o_ref (T, O),
    acc_ref (T, O) f32.
    """
    xq = refs[0:4]
    xo = refs[4:12]
    w2_ref, w1_ref = refs[12], refs[13]
    sq_ref, so_ref = refs[14], refs[15]
    o_ref, acc_ref = refs[16], refs[17]
    j = pl.program_id(2)

    w2 = w2_ref[:].astype(jnp.int32)
    w1 = w1_ref[:].astype(jnp.int32)

    dims = (((1,), (1,)), ((), ()))
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for q in range(4):
        two = jnp.bitwise_and(
            jnp.right_shift(w2, 2 * q), jnp.int32(3)
        ).astype(jnp.bfloat16)
        s_rows = sq_ref[q * s_q: (q + 1) * s_q, :]
        for sub in range(s_q):
            c0, c1 = sub * W4_GROUP, (sub + 1) * W4_GROUP
            p = jax.lax.dot_general(
                xq[q][:, c0:c1], two[:, c0:c1],
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            part = part + p * s_rows[sub, :].astype(
                jnp.float32
            )[None, :]
    for m in range(8):
        negsign = jnp.right_shift(
            jnp.left_shift(w1, 31 - m), 31
        ).astype(jnp.bfloat16)  # 0 or -1
        s_rows = so_ref[m * s_o: (m + 1) * s_o, :]
        for sub in range(s_o):
            c0, c1 = sub * W4_GROUP, (sub + 1) * W4_GROUP
            p = jax.lax.dot_general(
                xo[m][:, c0:c1], negsign[:, c0:c1],
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            part = part + p * (
                4.0 * s_rows[sub, :].astype(jnp.float32)
            )[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_tile", "in_tile", "out_dtype")
)
def w3_matmul(
    x: jnp.ndarray,  # (..., IN) bf16/f32, IN == in_p (padded)
    wq2: jnp.ndarray,  # (OUT, IN // 4) int8 — 2-bit plane
    wq1: jnp.ndarray,  # (OUT, IN // 8) int8 — sign plane
    scales: jnp.ndarray,  # (OUT, IN // 128) bf16 (out-major layout)
    *,
    out_tile: int = 2048,
    in_tile: int = 1024,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused int3 dequant-matmul over the pack_int3 plane layout.

    ``in_tile`` counts natural input columns; must divide IN and be a
    multiple of 1024 (so every octant sub-slice covers whole 128-col
    scale groups). The sub-4-bit memory-floor format: ~3.1
    bits/weight of HBM (70B -> 2 chips, tools/plan.py); decode runs
    VPU-bound at ~190-200 GB/s of plane traffic (see _w3_kernel) —
    a CAPACITY point, not a speed one (int4 is ~3x faster per chip).

    Default tiles from the v5e sweep (examples/autotune_w3.py):
    out_tile 2048 / in_tile 1024 lead on every 7B decode shape.
    """
    out_features = wq2.shape[0]
    in_features = wq2.shape[1] * 4
    if wq1.shape != (out_features, in_features // 8):
        raise ValueError(f"plane1 shape {wq1.shape} mismatch")
    if x.shape[-1] != in_features:
        raise ValueError(
            f"x last dim {x.shape[-1]} != padded in_features {in_features}"
        )
    if in_features % in_tile:
        raise ValueError(
            f"in_features {in_features} % in_tile {in_tile} != 0"
        )
    if in_tile % (8 * W4_GROUP):
        raise ValueError(f"in_tile {in_tile} % {8 * W4_GROUP} != 0")
    if scales.shape != (out_features, in_features // W4_GROUP):
        raise ValueError(f"scales shape {scales.shape} mismatch")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)
    # token tile capped at 256 (w8/w4 use 512): this kernel holds 12
    # zero-copy x views (4 quarter + 8 octant) PLUS the f32 scratch
    # per token tile — at 512 the double-buffered set overflows the
    # 16 MB scoped-VMEM budget (measured: 20.5 MB compiling a 512-row
    # batched admission prefill, 7B qkv shape). Decode (<=16 rows) is
    # untouched; prefill just takes 2x the token grid steps.
    t_tile = min(_round_up(max(tokens, 1), 16), 256)
    t_pad = _round_up(max(tokens, 1), t_tile)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    quart = in_tile // 4
    octw = in_tile // 8
    s_q = quart // W4_GROUP
    s_o = octw // W4_GROUP
    out_dtype = out_dtype or x.dtype

    # x is passed 12 times with different index maps (4 quarter + 8
    # octant views of the global split layout) — zero-copy. The
    # scales are regrouped OUTSIDE the kernel so each step's quarter
    # rows (4*s_q >= 8 — Pallas' sublane-tiling floor) and octant
    # rows (8*s_o >= 8) are contiguous blocks.
    def xq_spec(q):
        return pl.BlockSpec(
            (t_tile, quart), lambda t, i, j, q=q: (t, q * n_in + j),
            memory_space=pltpu.VMEM,
        )

    def xo_spec(m):
        return pl.BlockSpec(
            (t_tile, octw), lambda t, i, j, m=m: (t, m * n_in + j),
            memory_space=pltpu.VMEM,
        )

    sb = scales.astype(jnp.bfloat16).T  # (S, OUT) canonical rows
    sq_all = (
        sb.reshape(4, n_in, s_q, out_features)
        .transpose(1, 0, 2, 3)
        .reshape(n_in * 4 * s_q, out_features)
    )
    so_all = (
        sb.reshape(8, n_in, s_o, out_features)
        .transpose(1, 0, 2, 3)
        .reshape(n_in * 8 * s_o, out_features)
    )

    out = pl.pallas_call(
        functools.partial(
            _w3_kernel, n_in_tiles=n_in, s_q=s_q, s_o=s_o
        ),
        grid=(n_t, n_out, n_in),
        in_specs=(
            [xq_spec(q) for q in range(4)]
            + [xo_spec(m) for m in range(8)]
            + [
                pl.BlockSpec(  # 2-bit plane
                    (out_tile, quart), lambda t, i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # sign plane
                    (out_tile, octw), lambda t, i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # quarter scale rows of step j
                    (4 * s_q, out_tile), lambda t, i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # octant scale rows of step j
                    (8 * s_o, out_tile), lambda t, i, j: (j, i),
                    memory_space=pltpu.VMEM,
                ),
            ]
        ),
        out_specs=pl.BlockSpec(
            (t_tile, out_tile), lambda t, i, j: (t, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * t_pad * o_pad * in_features,
            bytes_accessed=out_features * in_features * 3 // 8
            + out_features * (in_features // W4_GROUP) * 2
            + t_pad * in_features * 2
            + t_pad * out_features * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        *([x2.astype(jnp.bfloat16)] * 12),
        wq2,
        wq1,
        sq_all,
        so_all,
    )

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)
