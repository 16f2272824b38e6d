"""Per-shape w8_matmul bandwidth on the real chip (decode token count).

Builds each 7B linear shape directly on device and times the kernel in
a long on-device fori_loop (one host sync; sync floor subtracted).

Run: python examples/kernel_bench.py [n_iter]
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

    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import Int8Linear, pick_group

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    timeit = make_timer(n)
    key = jax.random.PRNGKey(0)

    def lin(in_f, out_f):
        nonlocal key
        g = pick_group(in_f)
        in_p = in_f + ((-in_f) % g)
        key, k1, k2 = jax.random.split(key, 3)
        wq = jax.random.randint(k1, (out_f, in_p), -127, 128, dtype=jnp.int8)
        scales = 0.005 * (
            1 + jax.random.uniform(k2, (in_p // g, out_f), jnp.float32)
        )
        return Int8Linear(wq=wq, scales=scales, bias=None)

    h, inter, vocab = 4096, 11008, 32000
    shapes = {
        "qkv": (lin(h, 3 * h), h),
        "o": (lin(h, h), h),
        "gate_up": (lin(h, 2 * inter), h),
        "down": (lin(inter, h), inter),
        "lm_head8": (lin(h, vocab), h),
    }
    key, k = jax.random.split(key)
    head = DenseLinear(
        weight=0.01 * jax.random.normal(k, (vocab, h), jnp.bfloat16),
        bias=None,
    )

    tot = 0.0
    for name, (m, in_f) in shapes.items():
        x = jnp.ones((1, 1, in_f), jnp.bfloat16)
        t = timeit(lambda v, mm=m: mm(v), x)
        b = m.wq.size + m.scales.size * 4
        mult = 32 if name != "lm_head8" else 1
        tot += t * mult
        print(
            f"{name:9s} {t*1e6:8.1f} us  {b/1e6:7.1f} MB "
            f"{b/t/1e9:7.1f} GB/s"
        )
    x = jnp.ones((1, 1, h), jnp.bfloat16)
    t = timeit(lambda v: head(v), x)
    b = head.weight.size * 2
    print(
        f"{'lm_head16':9s} {t*1e6:8.1f} us  {b/1e6:7.1f} MB "
        f"{b/t/1e9:7.1f} GB/s"
    )
    print(f"# 32-layer linears sum (w/ int8 head): {tot*1e3:.2f} ms")


if __name__ == "__main__":
    main()
