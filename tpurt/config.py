"""Render configuration: the single config surface for every constant the
reference hard-codes or compiles in (SURVEY.md §5 "Config / flag system").

Reference sources for defaults:
- max_samples=1024, exposure=3.0: include/Raytracer.hpp:39-41
- fov 45 degrees (tanHalfFov = tan(22.5 deg)): src/Raytracer.cpp:321
- recursion: pipeline cap 8 (src/util/PipelineBuilder.cpp:172), integrator
  bounce cap `depth++ < 7` (shaders/triangle.rchit:192)
- sky color (0.4, 0.5, 0.6): shaders/raytrace.rmiss:11
- eta_i=1.0 / eta_t=1.5: shaders/triangle.rchit:9-10 (the shader ignores the
  per-material ior and uses these constants)
- russian-roulette threshold 0.995: shaders/triangle.rchit:203
- t_max 999999999.0: shaders/raytrace.rgen:71
- shadow/bounce ray origin offset 0.01 along the normal: triangle.rchit:77,211
- emissive-without-texture x200 fallback: triangle.rchit:175-178
- default sphere lights: src/main.cpp:27-31
- default window 640x480: src/main.cpp:18
- frames in flight 3: include/Config.hpp:7
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SphereLight:
    """A sphere area light (reference `Sphere`,
    include/util/AccelerationStructureBuilder.hpp:7-11): position + radius,
    rgb color + scalar intensity (color.a in the reference's LightData)."""

    position: Tuple[float, float, float]
    radius: float
    color: Tuple[float, float, float]
    intensity: float


# The three hard-coded lights from the reference composition root
# (src/main.cpp:27-31); positioned for the Sponza sample scene.
DEFAULT_SPONZA_LIGHTS = (
    SphereLight((-8.3395, -5.76978, -2.3374), 0.1, (0.8, 0.6, 0.6), 500.0),
    SphereLight((8.9656, -5.76978, -2.6374), 0.1, (0.4, 0.7, 0.6), 500.0),
    SphereLight((155.73348522, -1000.92734623, 140.05059690), 50.0, (0.9, 0.9, 0.7), 1000.0),
)


@dataclasses.dataclass(frozen=True)
class KernelPolicy:
    """Measured traversal-kernel policy, promoted from module globals into
    the one config surface SURVEY.md §5 prescribes. Every field default is
    the measured production profile (docs/PERFORMANCE.md); reproducing a
    benchmark configuration needs only a KernelPolicy value, no source
    edits. Frozen dataclass => hashable => usable as a static jit arg.

    Trace-time fields (consumed per closest/occlusion dispatch):
    - sort_wave0: octant-morton sort the camera wave (row-major tiles are
      already coherent; measured off).
    - sort_retrace: sort alpha re-trace batches (measured off: argsort
      costs more than the packet coherence it buys on the small batches).
    - pair_*/dual_*/descend_*: alternative step structures, all measured
      OFF (docs/PERFORMANCE.md rounds 3-4).
    - cell_masks_closest: in-kernel decided-cell any-hit for closest
      traces (measured ON, round 4: alpha machinery 102 -> 73 ms).
    - octet_*: multi-walk kernel, 0 = off (measured: loses at 2/4/8).
    - sumcol: f32 sum-pack hit-mask collapse (~140 ns/step) vs the
      bit-rotate fallback (~680 ns/step).
    - unroll: traversal steps per while-loop iteration.

    Build-time fields (consumed when packing the wide tables):
    - arity: wide-node branching factor (16 = full 128-lane rows).
    - resident_budget_mb: VMEM ceiling for whole-table residency.
    """

    sort_wave0: bool = False
    sort_retrace: bool = False
    pair_closest: bool = False
    dual_closest: bool = False
    pair_occlusion: bool = False
    dual_occlusion: bool = False
    descend_closest: bool = False
    descend_occlusion: bool = False
    cell_masks_closest: bool = True
    octet_closest: int = 0
    octet_occlusion: int = 0
    # superpacket width: sup*1024 rays share one program / one scalar
    # step chain (pallas_wide._wide_packets `sup`); 1 = off. Defaults
    # from three round-5 block-interleaved races (docs/PERFORMANCE.md):
    # closest 2, applied by the dispatcher to INCOHERENT traces only
    # (+7..11% there; the coherent camera wave measured -3..-17% under
    # it), occlusion 4 (+11..31%; requires the exact sumcol fold — see
    # pallas_wide._wide_kernel's accumulator bound note).
    sup_closest: int = 2
    sup_occlusion: int = 4
    sumcol: bool = True
    unroll: int = 4
    arity: int = 16
    resident_budget_mb: int = 104

    @property
    def resident_budget(self) -> int:
        return self.resident_budget_mb * 2 ** 20


DEFAULT_KERNEL_POLICY = KernelPolicy()


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All render-time knobs. Field defaults replicate the reference."""

    width: int = 640
    height: int = 480
    max_samples: int = 1024          # Raytracer.hpp:39
    exposure: float = 3.0            # Raytracer.hpp:41
    fov_degrees: float = 45.0        # Raytracer.cpp:321
    max_depth: int = 7               # triangle.rchit:192 (bounces beyond camera hit)
    samples_per_launch: int = 1      # nSamples, raytrace.rgen:33
    t_max: float = 999999999.0       # raytrace.rgen:71
    t_min: float = 0.0
    ray_offset: float = 0.01         # triangle.rchit:77,103,211
    rr_threshold: float = 0.995      # triangle.rchit:203
    sky_color: Tuple[float, float, float] = (0.4, 0.5, 0.6)  # raytrace.rmiss:11
    eta_i: float = 1.0               # triangle.rchit:9
    eta_t: float = 1.5               # triangle.rchit:10
    emissive_untextured_scale: float = 200.0  # triangle.rchit:178
    # Max re-traversals to resolve alpha-tested (any-hit) transparency; the
    # reference's ignoreIntersectionEXT (raytrace.rahit:57-58) can in principle
    # skip arbitrarily many surfaces, a fixed cap keeps shapes static on TPU.
    max_alpha_skips: int = 8
    # RNG seed; the reference seeds from wall-clock time bits
    # (raytrace.rgen:45); we default to a fixed seed for reproducibility.
    seed: int = 0
    # Render each progressive sample in row bands of this height (0 = whole
    # frame in one launch). Chunking bounds per-launch wall time and the
    # wavefront state memory at high resolutions.
    chunk_rows: int = 0
    # Samples per pixel traced in one launch (ray batch = k * pixels). The
    # per-bounce-wave fixed costs amortize over k, at k x the launch time
    # and memory; progressive accumulation then advances k samples a step.
    spp_per_launch: int = 1
    # Fold the BSDF-MIS sample into the bounce ray (the standard
    # one-draw-serves-both wavefront construction, cf. pbrt): the
    # reference's second NEE sample is ALWAYS the envmap branch (the dead
    # lightIndex override, triangle.rchit:92) and contributes only when
    # its ray escapes the scene (weightBSDFEnvmap zeroes surface and
    # sphere hits, raytrace-common.glsl:102-107) — and the next wave's
    # closest trace of the bounce ray answers exactly "did it escape".
    # Folding halves the fused NEE shadow batch (measured 61% of band
    # time). Per-term expectation is unchanged (a pdf-ratio correction
    # covers the alpha<0.01 lanes where the reference's sampling alphas
    # differ); the differences vs the reference are (a) sample
    # correlation between the MIS term and the bounce (variance only,
    # not the mean) and (b) the depth++-on-miss quirk (raytrace.rmiss:10)
    # no longer consuming bounce budget for the folded MIS ray. False
    # restores the reference's exact two-NEE-ray estimator.
    fold_bsdf_mis: bool = True
    # Measured traversal-kernel policy (see KernelPolicy). The default is
    # the production profile; benchmarks override fields here instead of
    # editing module globals.
    kernel: KernelPolicy = DEFAULT_KERNEL_POLICY
    # ---- wavefront compaction machinery (integrator/wavefront.py) ----
    # capacity LADDER: sort alive-first between late waves and shrink
    # the batch to 3/4 then 3/8 when survivors fit (trace_paths).
    # Default OFF since the round-5 device A/B measured it NEUTRAL
    # (-0.1% on the 1080p band, benchmarks/compact_ab.json) while its 4
    # extra wave-site instantiations inflate the compiled program and
    # its ~20-minute cold remote compile. The flag restores it.
    compact_ladder: bool = False
    # compacted shade section inside the tail loop: hits-first sort,
    # shade block at n/shade_frac when the hit count fits; 0 = off
    shade_frac: int = 2
    # compacted alpha re-trace: rejected rays sort into an n/retrace_frac
    # slice for the re-trace relaunch + texture recheck; 0 = full-width
    retrace_frac: int = 8
    # compaction lowering per section: True = one 2-column index sort +
    # cap-sized gathers in / cap-sized scatters out; False = full-width
    # variadic sorts both ways. Split per section because their
    # economics differ wildly: the re-trace slices are n/8 with ~6
    # output columns, the shade section is n/2 with 17 output columns
    # (the round-5 bundled A/B measured the bundle at +10.3% — the
    # shade scatters dominate). A/B via benchmarks/compact_ab.py.
    retrace_gather: bool = False
    shade_gather: bool = False
    ladder_gather: bool = False

    @property
    def tan_half_fov(self) -> float:
        """tanHalfFov push constant (Raytracer.cpp:321)."""
        return math.tan(math.radians(self.fov_degrees) / 2.0)

    @property
    def aspect_ratio(self) -> float:
        """aspectRatio push constant (Raytracer.cpp:319-320)."""
        return self.width / self.height
