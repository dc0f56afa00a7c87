"""tpurt — a TPU-native (JAX/XLA/Pallas) Monte-Carlo path-tracing framework.

A from-scratch rebuild of the capabilities of pixelcluster/VkRaytracer
(C++20 + Vulkan RT, see /root/reference) designed TPU-first:

- the recursive Vulkan RT megakernel (raytrace.rgen + triangle.rchit recursion,
  reference shaders/triangle.rchit:192-218) becomes an iterative wavefront loop
  of batched kernels over flat ray arrays (`tpurt.integrator`),
- the driver-built BLAS/TLAS (reference src/util/AccelerationStructureBuilder.cpp)
  becomes a device-built LBVH with stackless batched traversal (`tpurt.bvh`),
- the cgltf/stb_image scene loader (reference src/util/ModelLoader.cpp) becomes
  a pure-Python glTF 2.0 ingester producing flat SoA device arrays
  (`tpurt.scene`),
- scaling happens over a `jax.sharding.Mesh` by sharding samples-per-pixel or
  image tiles across chips with `shard_map` + `psum` (`tpurt.parallel`).
"""

from tpurt.config import DEFAULT_SPONZA_LIGHTS, RenderConfig, SphereLight
from tpurt.camera import Camera

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "SphereLight",
    "DEFAULT_SPONZA_LIGHTS",
    "Camera",
    "Renderer",
    "__version__",
]


def __getattr__(name):
    # lazy: Renderer pulls in the full jax stack
    if name == "Renderer":
        from tpurt.renderer import Renderer

        return Renderer
    raise AttributeError(name)
