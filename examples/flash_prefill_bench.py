"""Prefill attention on the real chip: dense mask vs pallas flash.

Compares the three candidate prefill-attention paths at LLaMA-2 7B
geometry (32 q heads / 32 kv heads, hd 128 — 7B is MHA) and at a GQA
geometry (32/8), batch 1, over sequence lengths:

  dense      — materialize (S, S) scores with a causal mask (the
               current default path in models/llama.py)
  flash fp32 — pallas flash_attention with fp32 q/k/v (what round 1
               shipped, gated off because it measured slower)
  flash bf16 — pallas flash_attention with bf16 q/k/v (MXU-native)

Run: python examples/flash_prefill_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, *args, iters=50):
    """On-device fori_loop timing with a scalar host fetch as the sync
    (block_until_ready does not reliably block through the tunnel —
    same pattern as examples/kernel_bench.py)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, k, v):
        def body(i, s):
            qi = q * (1.0 + i.astype(q.dtype) * 1e-12)
            out = fn(qi, k, v)
            return s + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def tiny(q):
        return jnp.sum(q)

    float(run(*args))  # compile
    float(tiny(args[0]))
    floors, times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tiny(args[0]))
        floors.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    return max(min(times) - min(floors), 1e-9) / iters


def dense_attn(q, k, v, scale):
    # q/k/v: (B, S, H, D) — same math as models/llama.py dense path
    import jax
    import jax.numpy as jnp

    B, S, H, D = q.shape
    scores = jnp.einsum(
        "bshd,bthd->bhst", q.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * scale
    mask = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    print(jax.devices())
    rng = jax.random.PRNGKey(0)

    for nh, nkv in ((32, 32), (32, 8)):
        for seq in (512, 1024, 2048):
            hd = 128
            group = nh // nkv
            ks = jax.random.split(rng, 3)
            q = jax.random.normal(ks[0], (1, seq, nh, hd), jnp.bfloat16)
            k = jax.random.normal(ks[1], (1, seq, nkv, hd), jnp.bfloat16)
            v = jax.random.normal(ks[2], (1, seq, nkv, hd), jnp.bfloat16)
            scale = hd ** -0.5

            def run_dense(q, k, v):
                kk = jnp.repeat(k, group, 2) if group > 1 else k
                vv = jnp.repeat(v, group, 2) if group > 1 else v
                return dense_attn(q, kk, vv, scale)

            def run_flash(q, k, v, dt):
                kk = jnp.repeat(k, group, 2) if group > 1 else k
                vv = jnp.repeat(v, group, 2) if group > 1 else v
                out = flash_attention(
                    q.transpose(0, 2, 1, 3).astype(dt),
                    kk.transpose(0, 2, 1, 3).astype(dt),
                    vv.transpose(0, 2, 1, 3).astype(dt),
                    causal=True, sm_scale=scale,
                )
                return out.transpose(0, 2, 1, 3).astype(q.dtype)

            t_dense = bench(run_dense, q, k, v)
            t_f32 = bench(
                lambda q, k, v: run_flash(q, k, v, jnp.float32),
                q, k, v,
            )
            t_bf16 = bench(
                lambda q, k, v: run_flash(q, k, v, jnp.bfloat16),
                q, k, v,
            )
            flops = 4 * seq * seq * nh * hd / 2  # causal
            print(
                f"h{nh}/kv{nkv} seq{seq}: "
                f"dense {t_dense*1e3:.3f} ms  "
                f"flash_f32 {t_f32*1e3:.3f} ms  "
                f"flash_bf16 {t_bf16*1e3:.3f} ms  "
                f"(bf16 {flops/t_bf16/1e12:.1f} TF/s)"
            )


if __name__ == "__main__":
    main()
