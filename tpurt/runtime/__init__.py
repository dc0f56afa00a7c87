"""Runtime: device discovery/selection and async frame pacing (the
RayTracingDevice analogue, SURVEY.md §2a)."""

from tpurt.runtime.device import (
    FRAMES_IN_FLIGHT,
    DeviceInfo,
    DeviceNotFound,
    FramePacer,
    list_devices,
    select_device,
)

__all__ = [
    "FRAMES_IN_FLIGHT",
    "DeviceInfo",
    "DeviceNotFound",
    "FramePacer",
    "list_devices",
    "select_device",
]
