"""Device/runtime management — the analogue of `RayTracingDevice`
(src/RayTracingDevice.cpp): device discovery/selection, capability
reporting, and frame pacing.

On TPU there is no instance/queue/swapchain plumbing — XLA owns memory and
scheduling — so this layer reduces to:

- device discovery + capability report (replaces the physical-device
  selection loop, RayTracingDevice.cpp:108-188; raises DeviceNotFound like
  the reference's DeviceNotFoundException :12-15 when a requested platform
  is absent),
- async frame pacing: JAX dispatch is asynchronous, so the reference's
  3-frames-in-flight ring (Config.hpp:7, RayTracingDevice.cpp:269-316)
  becomes a bounded queue of in-flight device computations — submit a new
  progressive sample while the previous ones execute, block only when the
  ring is full (`FramePacer`).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import List, Optional

import jax

FRAMES_IN_FLIGHT = 3  # parity with Config.hpp:7


class DeviceNotFound(RuntimeError):
    """Raised when no device of the requested platform exists (the
    reference throws DeviceNotFoundException, RayTracingDevice.cpp:185)."""


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    platform: str
    kind: str
    index: int
    memory_bytes: Optional[int]

    @property
    def is_tpu(self) -> bool:
        return "tpu" in self.kind.lower() or self.platform in ("tpu", "axon")


def list_devices() -> List[DeviceInfo]:
    infos = []
    for i, d in enumerate(jax.devices()):
        stats = None
        try:
            ms = d.memory_stats()
            stats = ms.get("bytes_limit") if ms else None
        except Exception:
            stats = None
        infos.append(DeviceInfo(platform=d.platform, kind=str(d), index=i,
                                memory_bytes=stats))
    return infos


def select_device(platform: Optional[str] = None) -> DeviceInfo:
    """Pick the first device, optionally constrained to a platform
    (mirrors the reference's 'first suitable physical device' rule,
    RayTracingDevice.cpp:108-188)."""
    for info in list_devices():
        if platform is None or info.platform == platform or (
            platform == "tpu" and info.is_tpu
        ):
            return info
    raise DeviceNotFound(f"no device for platform={platform!r}; "
                         f"available: {[i.platform for i in list_devices()]}")


class FramePacer:
    """Bounded in-flight computation ring (the frames-in-flight analogue).

    JAX dispatch is async: `submit` enqueues a device computation and only
    blocks (like vkWaitForFences, RayTracingDevice.cpp:418) when more than
    `depth` results are outstanding."""

    def __init__(self, depth: int = FRAMES_IN_FLIGHT):
        self.depth = depth
        self._inflight = deque()

    def submit(self, value):
        """Track an async result; returns the oldest completed value if the
        ring overflowed, else None."""
        self._inflight.append(value)
        if len(self._inflight) > self.depth:
            oldest = self._inflight.popleft()
            jax.block_until_ready(oldest)
            return oldest
        return None

    def drain(self):
        """Wait for everything (vkDeviceWaitIdle / waitAllFences analogue,
        RayTracingDevice.cpp:532-538)."""
        out = list(self._inflight)
        self._inflight.clear()
        if out:
            jax.block_until_ready(out)
        return out
