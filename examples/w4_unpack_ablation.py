"""w4 tuning sweep: production kernel structure + single-knob deltas.

Key round-5 finding: converting int->bf16 PER 128-col slice inside the
sub-dot loop is what keeps the production kernel at ~594 GB/s; variants
that materialize the whole bf16 tile lose ~180 GB/s to spills. This
sweep keeps that structure and varies one thing at a time:

  prod        exact production semantics (baseline)
  shift28     lo via single left-shift, 2^-28 folded into the lo scale
              row (per-slice converts preserved)
  it4096      in_tile = 4096
  t8          token tile 8 (f32 x operand) -- probe only
  g256        8 sub-dots of 256 cols sharing a scale row (probe for a
              group-256 format)

Run: python examples/w4_unpack_ablation.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from examples.kernel_bench import make_timer  # noqa: E402

W4_GROUP = 128


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(
    xl_ref, xh_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref,
    *, n_in_tiles, s_half, mode,
):
    j = pl.program_id(2)
    dims = (((1,), (1,)), ((), ()))

    w = w_ref[:].astype(jnp.int32)
    if mode == "shift28":
        lo = jnp.left_shift(w, 28)
        scale_lo = jnp.float32(2.0 ** -28)
    else:
        lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
        scale_lo = jnp.float32(1.0)
    hi = jnp.right_shift(w, 4)

    sl = sl_ref[:]
    sh = sh_ref[:]

    kcols = 2 * W4_GROUP if mode == "g256" else W4_GROUP
    nsub = lo.shape[1] // kcols
    stride = kcols // W4_GROUP
    part = jnp.zeros(acc_ref.shape, jnp.float32)
    for sub in range(nsub):
        c0, c1 = sub * kcols, (sub + 1) * kcols
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
        srow = sub * stride
        part = part + pl_ * (
            sl[srow, :].astype(jnp.float32)[None, :] * scale_lo
        )
        part = part + ph_ * sh[srow, :].astype(jnp.float32)[None, :]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_in_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def variant_matmul(x, wq, scales, *, out_tile, in_tile, mode):
    out_features = wq.shape[0]
    in_features = wq.shape[1] * 2
    tokens = x.shape[0]
    tmin = 8 if mode == "t8" else 16
    t_tile = min(_round_up(max(tokens, 1), tmin), 512)
    t_pad = _round_up(max(tokens, 1), t_tile)
    x2 = x
    if t_pad != tokens:
        x2 = jnp.pad(x, ((0, t_pad - tokens), (0, 0)))
    o_pad = _round_up(out_features, out_tile)
    n_t = t_pad // t_tile
    n_out = o_pad // out_tile
    n_in = in_features // in_tile
    half = in_tile // 2
    s_half = half // W4_GROUP
    xdt = jnp.float32 if mode == "t8" else jnp.bfloat16

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_in_tiles=n_in, s_half=s_half, mode=mode
        ),
        grid=(n_t, n_out, n_in),
        in_specs=[
            pl.BlockSpec((t_tile, half), lambda t, i, j: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, half), lambda t, i, j: (t, j + n_in),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_tile, half), lambda t, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_half, out_tile), lambda t, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_half, out_tile), lambda t, i, j: (j + n_in, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_tile, out_tile), lambda t, i, j: (t, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_tile, out_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(
        x2.astype(xdt),
        x2.astype(xdt),
        wq,
        scales.astype(jnp.bfloat16),
        scales.astype(jnp.bfloat16),
    )
    return out[:tokens]


def main():
    import numpy as np

    from vptq_tpu.ops.packing import pack_int4

    timeit = make_timer(300)
    rng = np.random.default_rng(0)

    # correctness of shift28 (exactness of the 2^-28 fold)
    out_f, in_f = 2048, 2048
    q = rng.integers(-8, 8, (out_f, in_f)).astype(np.int8)
    s = (0.01 * (1 + rng.random((in_f // 128, out_f)))).astype(np.float32)
    xs = rng.standard_normal((3, in_f)).astype(np.float32)
    w_ref = (
        q.astype(np.float32).T.reshape(in_f // 128, 128, out_f)
        * s[:, None, :]
    ).reshape(in_f, out_f)
    want = xs @ w_ref
    got = np.asarray(
        variant_matmul(
            jnp.asarray(xs, jnp.bfloat16), jnp.asarray(pack_int4(q)),
            jnp.asarray(s), out_tile=2048, in_tile=2048, mode="shift28",
        ),
        np.float32,
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"shift28 correctness: max rel err {rel:.4f}", flush=True)

    shapes = [
        ("gate_up", 22016, 4096),
        ("down", 4096, 12288),
        ("qkv", 12288, 4096),
        ("o", 4096, 4096),
    ]
    for name, out_f, in_f in shapes:
        in_p = _round_up(in_f, 4096)
        wq = jnp.asarray(
            rng.integers(-128, 128, (out_f, in_p // 2)), jnp.int8
        )
        n_groups = in_p // 128
        scales = jnp.asarray(
            0.005 * (1 + rng.random((n_groups, out_f))), jnp.bfloat16
        )
        x = jnp.ones((1, in_p), jnp.bfloat16)
        nbytes = wq.size + n_groups * out_f * 2
        ot = 2048 if out_f >= 8192 else (1024 if out_f >= 1024 else 512)

        for mode, itile in [
            ("prod", 2048),
            ("prod", 4096),
            ("shift28", 2048),
            ("shift28", 4096),
            ("t8", 2048),
            ("g256", 2048),
            ("g256", 4096),
        ]:
            try:
                t = timeit(
                    lambda v, m=mode, it=itile: variant_matmul(
                        v, wq, scales, out_tile=ot, in_tile=it, mode=m
                    ),
                    x,
                )
                print(
                    f"{name:8s} {mode:8s} it={itile} {t*1e6:8.1f} us "
                    f"{nbytes/t/1e9:7.1f} GB/s",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).split(chr(10))[0][:80]
                print(f"{name:8s} {mode:8s} it={itile} FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
