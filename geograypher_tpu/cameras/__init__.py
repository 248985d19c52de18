from geograypher_tpu.cameras.core import (
    CameraBatch,
    CameraSet,
    make_camera_batch,
    pixel_rays,
    project_points,
)
from geograypher_tpu.cameras.metashape import MetashapeCameraSet

__all__ = [
    "CameraBatch",
    "CameraSet",
    "make_camera_batch",
    "project_points",
    "pixel_rays",
    "MetashapeCameraSet",
]
