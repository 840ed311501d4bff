"""Device-mesh scaling: data-parallel registration, sharded pose-graph LM."""

from .sharding import (
    make_mesh,
    batched_align,
    batched_align_sharded,
    optimize_se2_sharded,
    shard_graph_edges,
)
from .multibag import MultiBagOdometry

__all__ = [
    "make_mesh", "batched_align", "batched_align_sharded",
    "optimize_se2_sharded", "shard_graph_edges", "MultiBagOdometry",
]
