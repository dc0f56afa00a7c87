"""Scene ingestion: glTF 2.0 parsing, procedural test scenes, and the flat
device-side SoA representation (replaces the reference's ModelLoader +
texture/descriptor plumbing, src/util/ModelLoader.cpp)."""

from tpurt.scene.types import (
    HostCamera,
    HostGeometry,
    HostImage,
    HostMaterial,
    HostTexture,
    NO_TEXTURE,
    SceneData,
)
from tpurt.scene.gltf import camera_for_render, load_gltf
from tpurt.scene.device import DeviceScene, Materials, build_device_scene, lights_array

__all__ = [
    "HostCamera",
    "HostGeometry",
    "HostImage",
    "HostMaterial",
    "HostTexture",
    "NO_TEXTURE",
    "SceneData",
    "camera_for_render",
    "load_gltf",
    "DeviceScene",
    "Materials",
    "build_device_scene",
    "lights_array",
]
