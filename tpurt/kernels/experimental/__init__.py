"""Experimental / measured-off kernel variants, excluded from production
dispatch (round-3 verdict, weak #5).

- `pallas_traverse`: the binary rope-link packet kernel the wide kernel
  evolved from (docs/PERFORMANCE.md round-1 history). Kept as an
  independently-implemented cross-check harness: tests compare the wide
  16-ary kernel's hits against it (tests/test_wide_kernel.py), and
  kernel_bench can still benchmark it (--kernel binary). It no longer
  appears in `closest_hit`/`occlusion_hit` dispatch or the Renderer's
  BVH-upgrade ladder — production touches exactly one kernel family
  (kernels/pallas_wide.py).

The stream-wide variant (pallas_swide.py, 8-ary streaming tables) was
deleted outright: it lost to the resident wide kernel on every measured
workload (benchmarks/kernel_bench_swide.json, docs/PERFORMANCE.md) and
duplicated the wide kernel's whole contract. The measurement artifacts
remain checked in.
"""
