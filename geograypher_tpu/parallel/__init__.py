from geograypher_tpu.parallel.pipeline import aggregate_class_images_distributed
from geograypher_tpu.parallel.planner import (
    AggregationPlan,
    PlannedAggregator,
    aggregate_counts_planned,
    plan_aggregation,
)
from geograypher_tpu.parallel.sharding import (
    make_view_mesh,
    shard_views_for_mesh,
    sharded_render_aggregate,
)

__all__ = [
    "make_view_mesh",
    "shard_views_for_mesh",
    "sharded_render_aggregate",
    "aggregate_class_images_distributed",
    "AggregationPlan",
    "PlannedAggregator",
    "aggregate_counts_planned",
    "plan_aggregation",
]
