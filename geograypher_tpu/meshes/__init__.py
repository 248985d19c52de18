from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.meshes.chunked import (
    aggregate_images_chunked,
    cluster_cameras,
    label_polygons_chunked,
    mesh_chunk_for_cameras,
    render_flat_chunked,
)
from geograypher_tpu.meshes.sparse import (
    aggregate_index_predictions,
    normalize_sparse_counts,
    sparse_argmax,
)

__all__ = [
    "TexturedMesh",
    "aggregate_images_chunked",
    "cluster_cameras",
    "label_polygons_chunked",
    "mesh_chunk_for_cameras",
    "render_flat_chunked",
    "aggregate_index_predictions",
    "normalize_sparse_counts",
    "sparse_argmax",
]
