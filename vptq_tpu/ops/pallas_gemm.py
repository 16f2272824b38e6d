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

__all__ = ["w8_matmul", "bf16_matmul"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_in_tiles: int):
    """One (out_tile, in_tile) grid step.

    x_ref: (T, I_T) bf16; w_ref: (O_T, I_T) int8;
    s_ref: (n_groups, O_T) f32 — per-(in-group, row) scales, group == I_T
    (all groups resident; row j selected per grid step);
    o_ref: (T, O_T) out dtype; acc_ref: (T, O_T) f32 scratch.
    """
    j = pl.program_id(1)

    w = w_ref[:].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part = part * s_ref[j, :][None, :]

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
    group ``g`` (``group == in_tile``).
    """
    out_features, in_features = wq.shape
    if in_features % in_tile:
        raise ValueError(f"in_features {in_features} % {in_tile} != 0")
    if scales.shape != (in_features // in_tile, out_features):
        raise ValueError(f"scales shape {scales.shape} mismatch")

    lead_shape = x.shape[:-1]
    tokens = 1
    for d in lead_shape:
        tokens *= d
    x2 = x.reshape(tokens, in_features)

    # pad token dim to the bf16 sublane tile
    t_pad = _round_up(max(tokens, 1), 16)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))

    o_pad = _round_up(out_features, out_tile)
    if o_pad != out_features:
        wq = jnp.pad(wq, ((0, o_pad - out_features), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, o_pad - out_features)))

    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    out_dtype = out_dtype or x.dtype

    out = pl.pallas_call(
        functools.partial(_w8_kernel, n_in_tiles=n_in),
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
            pl.BlockSpec(
                (n_in, out_tile), lambda i, j: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_pad, out_tile), lambda i, j: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_pad, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * o_pad * in_features,
            bytes_accessed=o_pad * in_features
            + t_pad * in_features * 2
            + t_pad * o_pad * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2.astype(jnp.bfloat16), wq, scales)

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)


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
    o_pad = _round_up(out_features, out_tile)
    if o_pad != out_features:
        w = jnp.pad(w, ((0, o_pad - out_features), (0, 0)))

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
        out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((t_pad, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x2.astype(w.dtype), w)

    out = out[:tokens, :out_features]
    return out.reshape(*lead_shape, out_features).astype(out_dtype)
