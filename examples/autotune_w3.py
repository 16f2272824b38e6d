"""Tile sweep for w3_matmul on the real chip (decode shapes).

Run: python examples/autotune_w3.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.kernel_bench import make_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vptq_tpu.ops.pallas_gemm import w3_matmul, w4_matmul

    timeit = make_timer(300)
    key = jax.random.PRNGKey(0)

    shapes = [
        ("qkv", 12288, 4096),
        ("gate_up", 22016, 4096),
        ("down", 4096, 12288),
        ("o", 4096, 4096),
    ]
    out_tiles = [512, 1024, 2048]

    for name, out_f, in_f in shapes:
        key, k1, k2, k3 = jax.random.split(key, 4)
        wq2 = jax.random.randint(
            k1, (out_f, in_f // 4), -128, 128, dtype=jnp.int8
        )
        wq1 = jax.random.randint(
            k2, (out_f, in_f // 8), -128, 128, dtype=jnp.int8
        )
        scales = 0.005 * (
            1
            + jax.random.uniform(
                k3, (out_f, in_f // 128), jnp.bfloat16
            )
        )
        scales4 = scales.T
        x = jnp.ones((1, in_f), jnp.bfloat16)
        b = wq2.size + wq1.size + scales.size * 2
        b4 = out_f * in_f // 2 + scales.size * 2
        best = (None, 0.0)
        for ot in out_tiles:
            if ot > out_f:
                continue
            for it in (1024, 2048):
                try:
                    t = timeit(
                        lambda v, ot=ot, it=it: w3_matmul(
                            v, wq2, wq1, scales,
                            out_tile=ot, in_tile=it,
                        ),
                        x,
                    )
                except Exception as e:
                    print(f"{name} ot={ot} it={it}: FAIL "
                          f"{type(e).__name__}")
                    continue
                bw = b / t / 1e9
                mark = " *" if bw > best[1] else ""
                if bw > best[1]:
                    best = (ot, bw, it, t)
                print(
                    f"{name:8s} ot={ot:5d} it={it:5d} {t*1e6:8.1f} us "
                    f"{bw:7.1f} GB/s{mark}",
                    flush=True,
                )
        # w4 comparison point at its best-known tile
        wq4 = jax.random.randint(
            k1, (out_f, in_f // 2), -128, 128, dtype=jnp.int8
        )
        t4 = timeit(
            lambda v: w4_matmul(
                v, wq4, scales4,
                out_tile=2048 if out_f >= 2048 else 1024,
                in_tile=2048,
            ),
            x,
        )
        print(
            f"# {name}: w3 best ot={best[0]} it={best[2]} @ "
            f"{best[1]:.0f} GB/s ({best[3]*1e6:.1f} us) | "
            f"w4 {b4/t4/1e9:.0f} GB/s ({t4*1e6:.1f} us) -> "
            f"w3/w4 time ratio {best[3]/t4:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
