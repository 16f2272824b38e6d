"""Tile/group sweep for w2_matmul on the real chip (decode shapes).

Round-5 measured summary (the numbers behind the kernel defaults and
the structure notes in pallas_gemm._w2_kernel):

  * out_tile 2048 / in_tile 1024 / group 64: ~0.55 T weights/s
    aggregate over the 7B shapes (~155 GB/s of plane+scale traffic) —
    VPU-op-bound at ~2.75 ops/weight, like the w3/w4 family;
  * in_tile 2048 is flat (+/-3%), 4096 VMEM-OOMs;
  * group=128 within noise of group=64 on SPEED (the choice is a
    FIDELITY knob — group 64 is the default);
  * measured-dead variants (kept out of production): in-kernel x
    group-sum reductions (-8%), weight-side scales via an
    MXU-expanded selection dot (-30%, the same verdict w3 reached).

Run: python examples/autotune_w2.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from examples.kernel_bench import make_timer  # noqa: E402


def main():
    import jax.numpy as jnp

    from vptq_tpu.ops.packing import pack_int2, quantize_int2
    from vptq_tpu.ops.pallas_gemm import w2_matmul

    timeit = make_timer(300)
    rng = np.random.default_rng(0)

    shapes = [
        ("qkv", 12288, 4096),
        ("gate_up", 22016, 4096),
        ("down", 4096, 11264),
        ("o", 4096, 4096),
    ]

    for group in (64, 128):
        for in_tile in (1024, 2048):
            tot_t, tot_b, tot_w = 0.0, 0, 0
            for name, out_f, in_f in shapes:
                if in_f % in_tile:
                    continue
                w = rng.normal(0, 0.02, (out_f, in_f)).astype(
                    np.float32
                )
                q, s = quantize_int2(w, group=group)
                p = jnp.asarray(pack_int2(q))
                sc = jnp.asarray(s, jnp.bfloat16)
                x = jnp.asarray(
                    rng.normal(0, 1, (1, in_f)), jnp.bfloat16
                )
                ot = 2048 if out_f >= 2048 else 1024
                t = timeit(
                    lambda xi, p=p, sc=sc, ot=ot: w2_matmul(
                        xi, p, sc, out_tile=ot, in_tile=in_tile
                    ),
                    x,
                )
                nb = p.nbytes + sc.nbytes
                print(
                    f"g={group} it={in_tile} {name:8s}: "
                    f"{t*1e6:7.1f} us  {nb/t/1e9:6.1f} GB/s  "
                    f"{out_f*in_f/t/1e12:.2f} Tw/s"
                )
                tot_t += t
                tot_b += nb
                tot_w += out_f * in_f
            if tot_t:
                print(
                    f"g={group} it={in_tile} TOTAL   : "
                    f"{tot_t*1e6:7.1f} us  {tot_b/tot_t/1e9:6.1f} "
                    f"GB/s  {tot_w/tot_t/1e12:.2f} Tw/s"
                )


if __name__ == "__main__":
    main()
