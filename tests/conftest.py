"""Test config: run everything on a virtual 8-device CPU mesh.

Keeps unit tests off the single shared TPU chip and lets sharding tests
exercise real multi-device GSPMD partitioning (SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the
# tunneled TPU); unit tests must not run over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU's default matmul runs bf16 fast-math on this host; golden
# comparisons against fp32 torch need true fp32 accumulation. (The
# JAX_DEFAULT_MATMUL_PRECISION env var is not honored by this jax
# version — set the config flag directly.)
import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU backend and
# sets jax_platforms programmatically — the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
