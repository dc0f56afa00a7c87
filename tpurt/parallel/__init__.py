"""Multi-chip parallelism: spp/tile sharding over a device mesh
(SURVEY.md §2d — the TPU-native replacement for the reference's absent
distributed layer)."""

from tpurt.parallel.shard import (
    ShardedRenderer,
    make_mesh,
    render_sample_sharded,
    render_sample_stats_sharded,
)

__all__ = ["ShardedRenderer", "make_mesh", "render_sample_sharded",
           "render_sample_stats_sharded"]
