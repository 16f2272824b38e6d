"""Small-K vector-quantization decode probe (VERDICT r4 item 1b).

Question: with k <= 256 centroids and v = 4-8 dims, can a TPU kernel
dequantize VQ weights IN-KERNEL at serving speed via a one-hot
selection-matrix dot on the MXU? (The round-1 "per-element gather is
infeasible" case was argued at k = 65536; this measures k = 256,
where the one-hot tile is a (tile, 256) operand and the codebook a
(256, v) operand.)

Format under test: ids (out, in/v) uint8 — each id selects a
(v,)-vector of the codebook laid along IN_FEATURES; bits/weight =
8/v (1.0-2.0 bits) + amortized codebook.

Kernel structure per (out_tile, in_tile) step:
  1. ids tile (O_T, I_T/v) u8 -> i32,
  2. one-hot build: ids[:, :, None] == iota(256) — the O(K) compare
     wall: 256 compares per id = 256/v VPU ops per weight,
  3. W_tile = onehot (O_T * I_T/v, 256) @ codebook (256, v) on the
     MXU — 2*256*v flops per id = 512 flops per weight (a 7B model
     at 512 flops/weight needs 3.4 PFLOPs/token: 17x the whole v5e
     MXU-second per decoded token),
  4. x @ W_tile^T.

Run: python examples/vq_smallk_probe.py [--check]
Prints one line per (v, variant) with measured ids/s, effective
weights/s, and the projected 7B decode tok/s; plus the measured
scalar-plane kernels for comparison.

The two structural walls ((2) and (3)) are both measured separately
(--onehot-only) so the conclusion does not hinge on one fused
implementation being clumsy.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def make_timer(n):
    import jax
    import jax.numpy as jnp

    def timeit(fn, x):
        @jax.jit
        def run(x0):
            def body(i, s):
                xi = x0 * (1.0 + i.astype(x0.dtype) * 1e-12)
                out = fn(xi)
                return s + jnp.sum(out.astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        @jax.jit
        def tiny(v):
            return jnp.sum(v)

        float(run(x))
        float(tiny(x))
        floors, times = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(tiny(x))
            floors.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        return max(min(times) - min(floors), 1e-9) / n

    return timeit


def vq_matmul(x, ids, codebook, *, v, out_tile=1024, in_tile=1024,
              onehot_only=False, interpret=False):
    """Fused VQ dequant-matmul: x @ (C[ids] reshaped (out, in))^T."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_f = ids.shape[0]
    in_f = ids.shape[1] * v
    k = codebook.shape[0]
    n_out = out_f // out_tile
    n_in = in_f // in_tile
    ipt = in_tile // v  # ids per row per step

    def kernel(x_ref, id_ref, c_ref, o_ref, acc_ref):
        # NOTE a single (O_T * ipt, 256) one-hot would need a
        # sublane<->lane reshape of the id tile, which Mosaic cannot
        # lower ("unsupported shape cast") — itself a structural
        # finding. The lowerable form builds the one-hot per id
        # COLUMN: ipt unrolled iterations of
        #   oh_c   = (ids[:, c] == iota(O_T, 256))      # the O(K)
        #   w_c    = oh_c @ C         (O_T, v)          # compare wall
        #   part  += x[:, c*v:(c+1)*v] @ w_c^T          # K=v dot
        j = pl.program_id(1)
        ids32 = id_ref[:].astype(jnp.int32)  # (O_T, ipt)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_tile, k), 1
        )
        dims = (((1,), (1,)), ((), ()))
        part = jnp.zeros((x_ref.shape[0], out_tile), jnp.float32)
        for c in range(ipt):
            oh = (ids32[:, c][:, None] == iota).astype(jnp.bfloat16)
            if onehot_only:
                # skip the selection dot: measures the compare wall
                # alone — contract the one-hot against x directly so
                # it is not DCE'd
                part = part + jax.lax.dot_general(
                    x_ref[:, c * v: c * v + 1],
                    jnp.sum(oh, axis=1, keepdims=True),
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
            else:
                w_c = jax.lax.dot_general(
                    oh, c_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # (O_T, v)
                part = part + jax.lax.dot_general(
                    x_ref[:, c * v: (c + 1) * v], w_c,
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )

        @pl.when(j == 0)
        def _():
            acc_ref[:] = part

        @pl.when(j > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    t = x.shape[0]
    t_pad = max(16, t)
    if t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec(
                (t_pad, in_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (out_tile, ipt), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, v), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_pad, out_tile), lambda i, j: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_pad, out_tile), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), ids, codebook.astype(jnp.bfloat16))
    return out[:t]


def main():
    import jax
    import jax.numpy as jnp

    check = "--check" in sys.argv
    out_f, in_f = 22016, 4096  # 7B gate_up decode shape
    rng = np.random.default_rng(0)
    timeit = make_timer(50)

    if check:
        # interpret-mode correctness of the fused kernel
        v, k = 8, 256
        of, inf_ = 256, 1024
        ids = rng.integers(0, k, (of, inf_ // v)).astype(np.uint8)
        cb = rng.normal(0, 0.02, (k, v)).astype(np.float32)
        x = rng.normal(0, 1, (3, inf_)).astype(np.float32)
        got = np.asarray(
            vq_matmul(
                jnp.asarray(x), jnp.asarray(ids), jnp.asarray(cb),
                v=v, out_tile=256, in_tile=1024, interpret=True,
            ),
            np.float32,
        )
        w = cb[ids.reshape(-1)].reshape(of, inf_)
        want = x.astype(np.float32) @ w.T
        err = np.abs(got - want).max()
        print("interpret check max abs err:", err)
        assert err < 0.05 * np.abs(want).max() + 0.05
        return

    print(f"# shape {out_f}x{in_f} (7B gate_up), decode T=1")
    rows = []
    for v in (4, 8):
        for onehot_only in (False, True):
            ids = jnp.asarray(
                rng.integers(0, 256, (out_f, in_f // v)).astype(
                    np.uint8
                )
            )
            cb = jnp.asarray(
                rng.normal(0, 0.02, (256, v)).astype(np.float32),
                jnp.bfloat16,
            )
            x = jnp.asarray(
                rng.normal(0, 1, (1, in_f)), jnp.bfloat16
            )
            fn = functools.partial(
                vq_matmul, ids=ids, codebook=cb, v=v,
                out_tile=512, in_tile=128 * v,  # ids lane-dim floor: 128
                onehot_only=onehot_only,
            )
            t = timeit(lambda xi: fn(xi), x)
            n_ids = out_f * in_f // v
            n_w = out_f * in_f
            # 7B decode = 6.61e9 linear weights/token (bench.py
            # logical_weights at llama2-7b geometry, minus embed)
            tok_s = 1.0 / (6.61e9 / (n_w / t))
            tag = "onehot-only" if onehot_only else "fused"
            rows.append(
                f"v={v} k=256 {tag:12s}: {t*1e6:8.1f} us  "
                f"{n_ids/t/1e9:6.2f} G ids/s  "
                f"{n_w/t/1e12:5.3f} Tw/s  -> 7B {tok_s:6.1f} tok/s  "
                f"({8/v:.1f} bits/w)"
            )
            print(rows[-1])
    print(
        "# scalar-plane kernels, same shape (examples/autotune_*): "
        "w4 ~1.2 Tw/s, w2 ~0.55 Tw/s, w3 ~0.53 Tw/s"
    )


if __name__ == "__main__":
    main()
