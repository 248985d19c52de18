from geograypher_tpu.cameras.core import (
    CameraBatch,
    CameraSet,
    make_camera_batch,
    pixel_rays,
    project_points,
)
from geograypher_tpu.cameras.colmap import COLMAPCameraSet
from geograypher_tpu.cameras.distortion import DistortionEngine
from geograypher_tpu.cameras.metashape import MetashapeCameraSet
from geograypher_tpu.cameras.rig import create_rig_cameras_from_equirectangular
from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet

__all__ = [
    "CameraBatch",
    "CameraSet",
    "make_camera_batch",
    "project_points",
    "pixel_rays",
    "MetashapeCameraSet",
    "COLMAPCameraSet",
    "SegmentorCameraSet",
    "DistortionEngine",
    "create_rig_cameras_from_equirectangular",
]
