"""w4 "VPU wall" candidates: the remaining structurally-different
unpack schemes, measured (VERDICT r3 item 4 — close the question).

Per-byte VPU-op accounting says every exact scheme needs ~20 vector
ops per 4 KB packed tile (2 bf16 plane-converts per byte are
irreducible because the MXU needs each nibble as its own lane value,
plus isolation bit-ops), so the measured 600-620 GB/s production
number should be a hardware wall. This harness measures the schemes
that could falsify that:

  prod      production structure (baseline; ops: widen + shl28 + shr4
            + 2 converts)
  fma16     repack byte = 16*hi + lo (bijective over the [-7,7] int4
            grid); kernel: ONE i32->f32 convert, hi = rint(f/16),
            lo = f - 16*hi (fma) — trades both shifts for mul+rint+fma
  fma16f32  fma16 with f32 MXU operands (skips the two bf16 converts;
            f32 MXU is slower but decode-T dots are tiny)
  i32x8     bitcast packed bytes to i32 (4 bytes/lane), extract 8
            offset-unsigned nibble planes with shift+mask+convert —
            no widen, planes map to contiguous 128-col x slices
  s8dot     THROUGHPUT PROBE: dot_general(s8 x s8 -> i32) on the raw
            packed bytes (wrong semantics on purpose) — measures
            whether an int8-MXU path could even beat VPU unpack
  cvtonly   THROUGHPUT PROBE: one bf16 convert per byte, single dot
            (wrong semantics) — the no-bit-logic ceiling

Run on the real chip: python examples/w4_wall_candidates.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from examples.kernel_bench import make_timer  # noqa: E402

GROUP = 128


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------- prod
def _prod_kernel(xl_ref, xh_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref,
                 *, n_in_tiles, s_half):
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))
    w = w_ref[:].astype(jnp.int32)
    lo = jnp.left_shift(w, 28)
    hi = jnp.right_shift(w, 4)
    sl = sl_ref[:].astype(jnp.float32) * jnp.float32(2.0 ** -28)
    sh = sh_ref[:]
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(s_half):
        c0, c1 = sub * GROUP, (sub + 1) * GROUP
        pl_ = jax.lax.dot_general(
            xl_ref[:, c0:c1], lo[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        ph_ = jax.lax.dot_general(
            xh_ref[:, c0:c1], hi[:, c0:c1].astype(jnp.bfloat16),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        part = part + pl_ * sl[sub, :][None, :]
        part = part + ph_ * sh[sub, :].astype(jnp.float32)[None, :]
    _accumulate(j, n_in_tiles, acc_ref, o_ref, part)


def _accumulate(j, n_in_tiles, acc_ref, o_ref, part):
    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# --------------------------------------------------------------- fma16
def _fma16_kernel(xl_ref, xh_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref,
                  *, n_in_tiles, s_half, f32_mxu):
    """byte = 16*hi + lo, |lo| <= 7 -> hi = rint(b/16), lo = b - 16*hi."""
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))
    f = w_ref[:].astype(jnp.float32)
    hi = jnp.round(f * jnp.float32(0.0625))
    lo = f - 16.0 * hi
    if not f32_mxu:
        hi = hi.astype(jnp.bfloat16)
        lo = lo.astype(jnp.bfloat16)
    sl = sl_ref[:]
    sh = sh_ref[:]
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(s_half):
        c0, c1 = sub * GROUP, (sub + 1) * GROUP
        xl = xl_ref[:, c0:c1]
        xh = xh_ref[:, c0:c1]
        if f32_mxu:
            xl = xl.astype(jnp.float32)
            xh = xh.astype(jnp.float32)
        pl_ = jax.lax.dot_general(
            xl, lo[:, c0:c1],
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        ph_ = jax.lax.dot_general(
            xh, hi[:, c0:c1],
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        part = part + pl_ * sl[sub, :].astype(jnp.float32)[None, :]
        part = part + ph_ * sh[sub, :].astype(jnp.float32)[None, :]
    _accumulate(j, n_in_tiles, acc_ref, o_ref, part)


# --------------------------------------------------------------- i32x8
def _i32x8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref,
                  *, n_in_tiles, n_super):
    """w_ref: (out_tile, in_tile/8) int32 — each i32 packs 8 nibbles,
    plane p = natural columns [128p, 128p+128) of a 1024-col
    superblock, offset-unsigned (q+8 in [1,15]). The x operand is
    natural-order; the +8 offset correction is skipped here (perf
    harness; in production it is a per-(t, group) rank-1 term on the
    accumulator, computed from x group-sums — O(T) extra work)."""
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))
    w = w_ref[:]
    u = pltpu.bitcast(w, jnp.uint32)
    s = s_ref[:]
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sup in range(n_super):
        wcol = u[:, sup * GROUP: (sup + 1) * GROUP]
        for p in range(8):
            if p == 0:
                plane = wcol & jnp.uint32(15)
            elif p == 7:
                plane = jax.lax.shift_right_logical(
                    wcol, jnp.uint32(28))
            else:
                plane = jax.lax.shift_right_logical(
                    wcol, jnp.uint32(4 * p)) & jnp.uint32(15)
            c0 = sup * 1024 + p * GROUP
            pp = jax.lax.dot_general(
                x_ref[:, c0: c0 + GROUP],
                pltpu.bitcast(plane, jnp.int32).astype(jnp.bfloat16),
                dimension_numbers=dims,
                preferred_element_type=jnp.float32)
            srow = sup * 8 + p
            part = part + pp * s[srow, :].astype(jnp.float32)[None, :]
    _accumulate(j, n_in_tiles, acc_ref, o_ref, part)


# --------------------------------------------------------------- probes
def _s8dot_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_in_tiles):
    """PROBE: int8 x int8 -> int32 MXU dot on raw packed bytes."""
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))
    p_ = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=dims, preferred_element_type=jnp.int32)
    part = p_.astype(jnp.float32) * s_ref[0, :].astype(jnp.float32)
    _accumulate(j, n_in_tiles, acc_ref, o_ref, part)


def _cvtonly_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_in_tiles):
    """PROBE: one bf16 convert per byte, one dot — no bit logic."""
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))
    wb = w_ref[:].astype(jnp.bfloat16)
    p_ = jax.lax.dot_general(
        x_ref[:], wb,
        dimension_numbers=dims, preferred_element_type=jnp.float32)
    part = p_ * s_ref[0, :].astype(jnp.float32)
    _accumulate(j, n_in_tiles, acc_ref, o_ref, part)


def run_variant(mode, x, wq, scales, *, out_tile, in_tile):
    """x: (T, in_features) bf16 (in natural columns); wq packed
    (out, in/2) int8 (prod/fma16 nibble layout) or (out, in/8) int32
    (i32x8); scales (in/128, out)."""
    out_features = wq.shape[0]
    in_features = x.shape[1]
    tokens = x.shape[0]
    t_tile = min(_round_up(max(tokens, 1), 16), 512)
    t_pad = _round_up(max(tokens, 1), t_tile)
    x2 = x
    if t_pad != tokens:
        x2 = jnp.pad(x, ((0, t_pad - tokens), (0, 0)))
    o_pad = _round_up(out_features, out_tile)
    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    half = in_tile // 2
    s_half = half // GROUP
    common = dict(
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )

    if mode in ("prod", "fma16", "fma16f32"):
        kern = (
            functools.partial(
                _prod_kernel, n_in_tiles=n_in, s_half=s_half)
            if mode == "prod"
            else functools.partial(
                _fma16_kernel, n_in_tiles=n_in, s_half=s_half,
                f32_mxu=(mode == "fma16f32"))
        )
        out = pl.pallas_call(
            kern,
            grid=(n_t, n_out, n_in),
            in_specs=[
                pl.BlockSpec((t_tile, half), lambda t, i, j: (t, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_tile, half),
                             lambda t, i, j: (t, j + n_in),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_tile, half), lambda t, i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_half, out_tile), lambda t, i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_half, out_tile),
                             lambda t, i, j: (j + n_in, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t_tile, out_tile), lambda t, i, j: (t, i),
                memory_space=pltpu.VMEM),
            **common,
        )(x2, x2, wq, scales, scales)
        return out[:tokens]

    if mode == "i32x8":
        n_super = in_tile // 1024
        s_rows = in_tile // GROUP
        out = pl.pallas_call(
            functools.partial(
                _i32x8_kernel, n_in_tiles=n_in, n_super=n_super),
            grid=(n_t, n_out, n_in),
            in_specs=[
                pl.BlockSpec((t_tile, in_tile), lambda t, i, j: (t, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_tile, in_tile // 8),
                             lambda t, i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_rows, out_tile), lambda t, i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t_tile, out_tile), lambda t, i, j: (t, i),
                memory_space=pltpu.VMEM),
            **common,
        )(x2, wq, scales)
        return out[:tokens]

    if mode in ("s8dot", "cvtonly"):
        # operand is the PACKED byte tile: in_tile/2 contraction cols
        kern = functools.partial(
            _s8dot_kernel if mode == "s8dot" else _cvtonly_kernel,
            n_in_tiles=n_in)
        xdt = jnp.int8 if mode == "s8dot" else jnp.bfloat16
        out = pl.pallas_call(
            kern,
            grid=(n_t, n_out, n_in),
            in_specs=[
                pl.BlockSpec((t_tile, half), lambda t, i, j: (t, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_tile, half), lambda t, i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, out_tile), lambda t, i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t_tile, out_tile), lambda t, i, j: (t, i),
                memory_space=pltpu.VMEM),
            **common,
        )(x2[:, : in_features // 2].astype(xdt), wq, scales)
        return out[:tokens]

    raise ValueError(mode)


def check_fma16_exact():
    """fma16 semantics: encode q (out, in) int4 pairs as
    byte = 16*q_hi + q_lo over the SAME half-split layout as prod."""
    rng = np.random.default_rng(0)
    out_f, in_f = 512, 2048
    q = rng.integers(-7, 8, (out_f, in_f)).astype(np.int32)
    half = in_f // 2
    b = (16 * q[:, half:] + q[:, :half]).astype(np.int8)
    s = (0.01 * (1 + rng.random((in_f // 128, out_f)))).astype(
        np.float32)
    xs = rng.standard_normal((3, in_f)).astype(np.float32)
    w_ref = (
        q.astype(np.float32).T.reshape(in_f // 128, 128, out_f)
        * s[:, None, :]
    ).reshape(in_f, out_f)
    want = xs @ w_ref
    got = np.asarray(
        run_variant(
            "fma16", jnp.asarray(xs, jnp.bfloat16), jnp.asarray(b),
            jnp.asarray(s, jnp.bfloat16), out_tile=512, in_tile=2048),
        np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"fma16 correctness (bf16 x + bf16 scales): rel err {rel:.4f}",
          flush=True)


def main():
    timeit = make_timer(300)
    rng = np.random.default_rng(0)
    check_fma16_exact()

    shapes = [
        ("gate_up", 22016, 4096),
        ("down", 4096, 12288),
        ("qkv", 12288, 4096),
        ("o", 4096, 4096),
    ]
    for name, out_f, in_f in shapes:
        in_p = _round_up(in_f, 4096)
        n_groups = in_p // 128
        wq8 = jnp.asarray(
            rng.integers(-120, 120, (out_f, in_p // 2)), jnp.int8)
        wq32 = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, (out_f, in_p // 8),
                         dtype=np.int64), jnp.int32)
        scales = jnp.asarray(
            0.005 * (1 + rng.random((n_groups, out_f))), jnp.bfloat16)
        x = jnp.ones((1, in_p), jnp.bfloat16)
        nbytes = out_f * in_p // 2 + n_groups * out_f * 2
        ot = 2048 if out_f >= 8192 else (1024 if out_f >= 1024 else 512)

        only = os.environ.get("W4_MODES")
        for mode, itile in [
            ("prod", 2048), ("fma16", 2048), ("fma16", 4096),
            ("fma16f32", 2048), ("i32x8", 2048), ("i32x8", 4096),
            ("s8dot", 2048), ("cvtonly", 2048),
        ]:
            if only and mode not in only.split(","):
                continue
            wq = wq32 if mode == "i32x8" else wq8
            try:
                t = timeit(
                    lambda v, m=mode, it=itile, w=wq: run_variant(
                        m, v, w, scales, out_tile=ot, in_tile=it),
                    x)
                print(f"{name:8s} {mode:9s} it={itile} {t*1e6:8.1f} us "
                      f"{nbytes/t/1e9:7.1f} GB/s", flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:90]
                print(f"{name:8s} {mode:9s} it={itile} FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
