"""Decode-step cost breakdown on the real chip
(--int4 / --int3 / --int2 / --int2-mixed / --int3-mixed).

Times each component of a 7B decode step in isolation:
  * each fused linear shape (qkv / o / gate_up / down) x32, lm_head
  * the attention/cache path alone
  * the full fused step (bench.py's decode_loop)

Run: python examples/profile_decode.py [--int4|--int3]
"""

import sys
import time

import numpy as np


def _sync(r):
    # block_until_ready is unreliable through the axon tunnel; force a
    # real device->host transfer of one element.
    import jax

    leaf = jax.tree_util.tree_leaves(r)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, x, n=50):
    """Device time per call of ``fn(x)``: n iterations inside one
    jitted fori_loop — the input is perturbed per iteration so XLA
    cannot hoist the call out of the loop — with one host sync at the
    end; the measured sync floor is subtracted.

    ``n`` auto-scales until the loop's device time dominates the
    tunnel sync floor (observed RTT through the axon tunnel varies
    2-30 ms day to day; a 50-iteration loop of a ~10 us op would be
    pure RTT jitter)."""
    import jax
    import jax.numpy as jnp

    def build(n):
        @jax.jit
        def run(x0):
            def body(i, s):
                xi = x0 * (1.0 + i.astype(x0.dtype) * 1e-12)
                out = fn(xi)
                return s + jnp.sum(out.astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return run

    @jax.jit
    def tiny(v):
        return jnp.sum(v)

    run = build(n)
    float(run(x))  # compile+warm
    float(tiny(x))
    t0 = time.perf_counter()
    float(tiny(x))
    floor0 = time.perf_counter() - t0
    # grow n until the measured loop is >= 4x the sync floor
    while True:
        t0 = time.perf_counter()
        float(run(x))
        total = time.perf_counter() - t0
        if total - floor0 >= 4 * floor0 or n >= 25600:
            break
        n *= 4
        run = build(n)
        float(run(x))  # recompile+warm

    floors, times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tiny(x))
        floors.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    return max(min(times) - min(floors), 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_7b_int8
    from vptq_tpu.models.llama import forward, init_cache
    from vptq_tpu.serving.generate import decode_loop

    fmt = "int8"
    for a in ("int4", "int3", "int2", "int2mixed", "int3mixed"):
        if f"--{a.replace('mixed', '-mixed')}" in sys.argv:
            fmt = a
    rng = np.random.default_rng(0)
    model = build_7b_int8(rng, fmt=fmt)
    cfg = model.cfg
    print("# model built", file=sys.stderr)

    blk = model.blocks[0]
    x = jnp.ones((1, 1, cfg.hidden_size), jnp.bfloat16)
    xi = jnp.ones((1, 1, cfg.intermediate_size), jnp.bfloat16)

    shapes = {
        "qkv": (blk.attn.qkv_proj, x),
        "o": (blk.attn.o_proj, x),
        "gate_up": (blk.mlp.gate_up_proj, x),
        "down": (blk.mlp.down_proj, xi),
    }
    total_lin = 0.0
    total_bytes = 0
    def lin_bytes(lin):
        import jax as _j

        return sum(
            y.nbytes for y in _j.tree.leaves(lin)
        )

    for name, (lin, inp) in shapes.items():
        t = timeit(lambda v, m=lin: m(v), inp)
        b = lin_bytes(lin)
        total_lin += t * cfg.num_hidden_layers
        total_bytes += b * cfg.num_hidden_layers
        print(
            f"{name:8s} {t*1e6:8.1f} us  {b/1e6:7.1f} MB "
            f"{b/t/1e9:7.1f} GB/s"
        )

    t_head = timeit(lambda v: model.lm_head(v), x)
    b_head = lin_bytes(model.lm_head)
    total_lin += t_head
    total_bytes += b_head
    print(
        f"{'lm_head':8s} {t_head*1e6:8.1f} us  {b_head/1e6:7.1f} MB "
        f"{b_head/t_head/1e9:7.1f} GB/s"
    )
    print(
        f"linears sum: {total_lin*1e3:.2f} ms/tok "
        f"({total_bytes/1e9:.2f} GB @ {total_bytes/total_lin/1e9:.0f} GB/s)"
    )

    # full step via decode_loop over N steps
    steps = 64
    cache = init_cache(cfg, 1, 256, jnp.bfloat16)
    first = jnp.asarray([1], jnp.int32)
    key = jax.random.PRNGKey(0)
    temp = jnp.asarray(0.0, jnp.float32)
    toks, cache = decode_loop(model, first, cache, key, temp, steps=steps)
    _sync(toks)
    times = []
    for _ in range(3):
        cache = init_cache(cfg, 1, 256, jnp.bfloat16)
        _sync(cache.k[0])
        t0 = time.perf_counter()
        toks, cache = decode_loop(
            model, first, cache, key, temp, steps=steps
        )
        _sync(toks)
        times.append((time.perf_counter() - t0) / steps)
    step_t = min(times)
    print(f"full step:   {step_t*1e3:.2f} ms/tok ({1/step_t:.1f} tok/s)")
    print(f"non-linear:  {(step_t-total_lin)*1e3:.2f} ms/tok")


if __name__ == "__main__":
    main()
