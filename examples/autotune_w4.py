"""Tile sweep for w4_matmul on the real chip (decode shapes).

Run: python examples/autotune_w4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.kernel_bench import make_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vptq_tpu.ops.pallas_gemm import w4_matmul

    timeit = make_timer(300)
    key = jax.random.PRNGKey(0)

    shapes = [
        ("qkv", 12288, 4096),
        ("gate_up", 22016, 4096),
        ("down", 4096, 12288),
        ("o", 4096, 4096),
    ]
    out_tiles = [256, 512, 1024, 2048]

    for name, out_f, in_f in shapes:
        key, k1, k2 = jax.random.split(key, 3)
        wq = jax.random.randint(
            k1, (out_f, in_f // 2), -128, 128, dtype=jnp.int8
        )
        scales = 0.005 * (
            1
            + jax.random.uniform(
                k2, (in_f // 128, out_f), jnp.bfloat16
            )
        )
        x = jnp.ones((1, in_f), jnp.bfloat16)
        b = wq.size + scales.size * 2
        best = (None, 0.0)
        for ot in out_tiles:
            if ot > out_f:
                continue
            try:
                t = timeit(
                    lambda v, ot=ot: w4_matmul(
                        v, wq, scales, out_tile=ot, in_tile=2048
                    ),
                    x,
                )
            except Exception as e:
                print(f"{name} ot={ot}: FAIL {type(e).__name__}")
                continue
            bw = b / t / 1e9
            mark = " *" if bw > best[1] else ""
            if bw > best[1]:
                best = (ot, bw)
            print(
                f"{name:8s} ot={ot:5d} {t*1e6:8.1f} us "
                f"{bw:7.1f} GB/s{mark}",
                flush=True,
            )
        print(f"# {name}: best ot={best[0]} @ {best[1]:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
