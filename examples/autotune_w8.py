"""Tile-size sweep for w8_matmul on the real chip (decode shapes).

Sweeps (out_tile, in_tile) per 7B/typical linear shape and prints the
achieved weight bandwidth for each; the winners feed the tile heuristic
in vptq_tpu/layers/runtime.py.

Run: python examples/autotune_w8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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


def main():
    import jax
    import jax.numpy as jnp

    from vptq_tpu.ops.pallas_gemm import w8_matmul

    timeit = make_timer(300)
    key = jax.random.PRNGKey(0)

    # (name, out, in, scale_group)
    shapes = [
        ("qkv", 12288, 4096, 2048),
        ("gate_up", 22016, 4096, 2048),
        ("down", 4096, 11264, 1024),
        ("lm_head", 32000, 4096, 2048),
        ("o", 4096, 4096, 2048),
    ]
    out_tiles = [256, 512, 1024, 2048]
    in_tiles = [512, 1024, 2048]

    for name, out_f, in_f, group in shapes:
        key, k1, k2 = jax.random.split(key, 3)
        wq = jax.random.randint(k1, (out_f, in_f), -127, 128, dtype=jnp.int8)
        scales = 0.005 * (
            1
            + jax.random.uniform(
                k2, (in_f // group, out_f), jnp.float32
            )
        )
        x = jnp.ones((1, in_f), jnp.bfloat16)
        b = wq.size + scales.size * 4
        best = (None, 0.0)
        for ot in out_tiles:
            for it in in_tiles:
                if it > group or group % it or in_f % it:
                    continue
                if ot > out_f:
                    continue
                try:
                    t = timeit(
                        lambda v, ot=ot, it=it: w8_matmul(
                            v, wq, scales, out_tile=ot, in_tile=it
                        ),
                        x,
                    )
                except Exception as e:
                    print(f"{name} ot={ot} it={it}: FAIL {type(e).__name__}")
                    continue
                bw = b / t / 1e9
                mark = ""
                if bw > best[1]:
                    best = ((ot, it), bw)
                    mark = " *"
                print(
                    f"{name:8s} ot={ot:5d} it={it:5d} "
                    f"{t*1e6:8.1f} us {bw:7.1f} GB/s{mark}",
                    flush=True,
                )
        print(f"# {name}: best {best[0]} @ {best[1]:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
