from geograypher_tpu.ops.aggregate import (
    accumulate_view,
    finalize_aggregation,
    init_aggregation,
    project_image_class_counts,
    project_image_to_faces,
    render_texture,
)
from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    rasterize_batch,
    rasterize_triangles,
)

__all__ = [
    "RasterConfig",
    "rasterize_triangles",
    "rasterize_batch",
    "render_texture",
    "project_image_to_faces",
    "project_image_class_counts",
    "init_aggregation",
    "accumulate_view",
    "finalize_aggregation",
]
