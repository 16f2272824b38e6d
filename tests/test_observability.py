"""Observability + registry utilities.

Covers the reference-parity monitor (reference: vptq/app_gpu.py),
profiling helpers, model registry, and single-host mesh construction.
"""

import glob
import os

import jax
import jax.numpy as jnp


def test_device_monitor_snapshot_and_polling():
    from vptq_tpu.utils.device_monitor import DeviceMonitor

    snap = DeviceMonitor.snapshot()
    assert set(snap) == {"bytes_in_use", "bytes_limit", "peak_bytes"}
    assert all(v >= 0 for v in snap.values())

    mon = DeviceMonitor(poll_interval=0.01).start()
    import time

    deadline = time.time() + 5.0
    while not mon.series()["time"] and time.time() < deadline:
        time.sleep(0.01)
    mon.stop()
    series = mon.series()
    assert len(series["time"]) >= 1
    assert len(series["bytes_in_use"]) == len(series["time"])


def test_device_time_measures_positive_duration():
    from vptq_tpu.utils.profiling import device_time

    w = jnp.ones((128, 128), jnp.float32)
    x = jnp.ones((128, 128), jnp.float32)
    sec = device_time(lambda a, b: a @ b, x, w, n_iter=4, n_time=2)
    assert sec > 0


def test_roofline_classifies_bound():
    from vptq_tpu.utils.profiling import roofline

    # huge traffic, trivial flops -> memory bound
    mem = roofline(seconds=1e-3, bytes_accessed=10**8, flops=10**3)
    assert mem["bound"] == "memory"
    assert mem["GB_per_s"] > 0
    # trivial traffic, huge flops -> compute bound
    comp = roofline(seconds=1e-3, bytes_accessed=10**3, flops=10**12)
    assert comp["bound"] == "compute"
    assert 0 < comp["mxu_utilization"]


def test_trace_writes_profile(tmp_path):
    from vptq_tpu.utils.profiling import trace

    with trace(str(tmp_path)) as d:
        jnp.sum(jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_registry_lists_known_models():
    from vptq_tpu.models.registry import (
        COMMUNITY_MODELS,
        SUPPORTED_FAMILIES,
    )

    assert len(COMMUNITY_MODELS) >= 10
    for hub_id, bits in COMMUNITY_MODELS:
        assert "/" in hub_id and 0 < bits <= 16
    assert "llama" in SUPPORTED_FAMILIES
    assert "deepseek_v3" in SUPPORTED_FAMILIES


def test_global_mesh_single_host():
    from vptq_tpu.parallel import distributed

    assert not distributed.is_multi_host()
    n = len(jax.devices())
    mesh = distributed.global_mesh(data=1, model=n)
    assert mesh.shape["model"] == n
    assert mesh.shape["data"] == 1
