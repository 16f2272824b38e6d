"""TPU device telemetry (parity with the reference's GPU monitor).

The reference polls pynvml for utilization/memory and renders a live
chart in the web app (reference: vptq/app_gpu.py:20-109). On TPU the
equivalent signal comes from PJRT ``memory_stats`` per device; this
keeps the same rolling-window design (100 samples).
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Dict, List

__all__ = ["DeviceMonitor"]

_MAX_SAMPLES = 100  # reference app_gpu.py:8-10


class DeviceMonitor:
    def __init__(self, poll_interval: float = 1.0):
        self.poll_interval = poll_interval
        self.samples: Dict[str, collections.deque] = {
            "time": collections.deque(maxlen=_MAX_SAMPLES),
            "bytes_in_use": collections.deque(maxlen=_MAX_SAMPLES),
            "bytes_limit": collections.deque(maxlen=_MAX_SAMPLES),
            "peak_bytes": collections.deque(maxlen=_MAX_SAMPLES),
        }
        self._stop = threading.Event()
        self._thread = None

    @staticmethod
    def snapshot() -> Dict[str, float]:
        import jax

        stats = {"bytes_in_use": 0, "bytes_limit": 0, "peak_bytes": 0}
        for dev in jax.local_devices():
            try:
                s = dev.memory_stats() or {}
            except Exception:  # pragma: no cover - platform specific
                s = {}
            stats["bytes_in_use"] += s.get("bytes_in_use", 0)
            stats["bytes_limit"] += s.get(
                "bytes_limit", s.get("bytes_reservable_limit", 0)
            )
            stats["peak_bytes"] += s.get("peak_bytes_in_use", 0)
        return stats

    def _poll(self):
        while not self._stop.is_set():
            s = self.snapshot()
            self.samples["time"].append(time.time())
            self.samples["bytes_in_use"].append(s["bytes_in_use"])
            self.samples["bytes_limit"].append(s["bytes_limit"])
            self.samples["peak_bytes"].append(s["peak_bytes"])
            self._stop.wait(self.poll_interval)

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._poll, daemon=True
            )
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def series(self) -> Dict[str, List[float]]:
        return {k: list(v) for k, v in self.samples.items()}
