"""Profiling / tracing utilities.

Parity with the reference's observability hooks (reference compiles
kernels with ``--generate-line-info`` for Nsight, csrc/CMakeLists.txt:39,
and polls pynvml in the app, vptq/app_gpu.py). TPU equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    Perfetto/TensorBoard trace directory.
  * :func:`device_time` — robust wall-time measurement of a jitted
    function on tunneled TPUs (loops the op inside one jit with a data
    dependency; a bare ``block_until_ready`` is unreliable through the
    tunnel and a host sync costs ~26 ms).
  * :func:`roofline` — bandwidth/FLOP utilization report for a matmul-
    shaped op.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["trace", "device_time", "roofline"]

# v5e single-chip peaks (Google published specs)
V5E_HBM_GBPS = 819.0
# bf16 MXU peak per v5e chip (the 394 figure often quoted is the
# int8 rate; every dot in this codebase accumulates from bf16
# operands)
V5E_BF16_TFLOPS = 197.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vptq_tpu_trace"):
    """``with trace("/tmp/t"):`` → TensorBoard/Perfetto trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(
    fn: Callable, *args, n_iter: int = 50, n_time: int = 3
) -> float:
    """Per-call device seconds for ``fn(*args)``.

    ``fn``'s first argument must be an array whose shape/dtype is
    preserved (or prefix-sliceable) from its output so iterations can
    chain — this forces real serialized device execution.
    """

    @jax.jit
    def run(x, *rest):
        def body(i, carry):
            out = fn(carry, *rest)
            out = out.reshape(-1)[: carry.size].reshape(carry.shape)
            return out.astype(carry.dtype)

        out = jax.lax.fori_loop(0, n_iter, body, x)
        return jnp.sum(out.astype(jnp.float32))

    float(run(*args))  # compile + warm
    times = []
    for _ in range(n_time):
        t0 = time.perf_counter()
        float(run(*args))  # host sync via scalar fetch
        times.append(time.perf_counter() - t0)

    # subtract the dispatch/sync floor
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    float(tiny(args[0]))
    t0 = time.perf_counter()
    float(tiny(args[0]))
    floor = time.perf_counter() - t0
    return max(min(times) - floor, 1e-9) / n_iter


def roofline(
    seconds: float,
    bytes_accessed: int,
    flops: int,
    hbm_gbps: float = V5E_HBM_GBPS,
    peak_tflops: float = V5E_BF16_TFLOPS,
) -> Dict[str, float]:
    """Utilization report for a measured op."""
    bw = bytes_accessed / seconds / 1e9
    tf = flops / seconds / 1e12
    return {
        "seconds": seconds,
        "GB_per_s": bw,
        "hbm_utilization": bw / hbm_gbps,
        "TFLOP_per_s": tf,
        "mxu_utilization": tf / peak_tflops,
        "bound": "memory"
        if (bytes_accessed / hbm_gbps) > (flops / 1e3 / peak_tflops)
        else "compute",
    }
