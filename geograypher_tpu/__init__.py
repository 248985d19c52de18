"""geograypher-tpu: TPU-native multiview geospatial photogrammetry.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
open-forest-observatory/geograypher: project per-pixel ML predictions from
drone surveys onto terrain meshes (and back), at TPU speed.

Layer map (bottom-up):
  ops/        device kernels: rasterization, projection/aggregation,
              ray casting, warping, triangulation
  parallel/   multi-chip sharding (pjit/shard_map over camera views)
  cameras/    camera math + Metashape/COLMAP parsing + distortion engine
  meshes/     textured mesh engine (geometry, textures, CRS, geospatial ops)
  predictors/ segmentor input adapters + orthomosaic pipelines
  utils/      host-side CRS/vector/raster/numeric support
  entrypoints/ user-facing workflows (aggregate_images, render_labels, ...)
"""

__version__ = "0.1.0"

_LAZY = {
    "TexturedMesh": "geograypher_tpu.meshes.mesh",
    "CameraSet": "geograypher_tpu.cameras.core",
    "CameraBatch": "geograypher_tpu.cameras.core",
    "MetashapeCameraSet": "geograypher_tpu.cameras.metashape",
    "COLMAPCameraSet": "geograypher_tpu.cameras.colmap",
    "SegmentorCameraSet": "geograypher_tpu.cameras.segmentor_set",
    "RasterConfig": "geograypher_tpu.ops.rasterize",
    "VectorData": "geograypher_tpu.utils.vector",
    "Raster": "geograypher_tpu.utils.raster",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
