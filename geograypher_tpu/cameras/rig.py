"""Synthetic perspective-camera rigs from equirectangular captures.

Port of /root/reference/geograypher/cameras/rig_cameras.py:9-105: a 360
capture's pose is fanned out into a rig of perspective cameras by
composing per-member roll/pitch/yaw rotations on the camera side, with
perspective image filenames derived via a format string.  Pairs with
``utils.image.perspective_from_equirectangular`` which produces the
matching resampled images.
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

from geograypher_tpu.cameras.core import CameraSet
from geograypher_tpu.cameras.metashape import MetashapeCameraSet
from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.utils.numeric import rotation_rpy_to_matrix


def create_rig_cameras_from_equirectangular(
    camera_file: PATH_TYPE,
    original_images: PATH_TYPE,
    perspective_images: PATH_TYPE,
    rig_camera: typing.Dict[str, float],
    rig_orientations: typing.List[typing.Dict[str, float]],
    perspective_filename_format_str: str,
) -> CameraSet:
    """Build the synthetic rig camera set; see the reference docstring
    (rig_cameras.py:17-46) for argument semantics."""
    initial = MetashapeCameraSet(
        camera_file=camera_file,
        image_folder=perspective_images,
        original_image_folder=original_images,
        default_sensor_params={"f": 1.0, "cx": 0.0, "cy": 0.0},
    )

    rig_transforms = []
    image_extensions = []
    for orientation in rig_orientations:
        t = np.eye(4)
        t[:3, :3] = rotation_rpy_to_matrix(
            orientation["roll_deg"],
            orientation["pitch_deg"],
            orientation["yaw_deg"],
        )
        rig_transforms.append(t)
        image_extensions.append(
            perspective_filename_format_str.format(**orientation)
        )

    new_transforms = [
        c2w @ rig_t
        for c2w in initial.cam_to_world_transforms
        for rig_t in rig_transforms
    ]
    new_filenames = [
        Path(fname.parent, fname.stem + ext + ".png")
        for fname in initial.image_filenames
        for ext in image_extensions
    ]
    return CameraSet(
        cam_to_world_transforms=new_transforms,
        intrinsic_params_per_sensor_type={0: dict(rig_camera)},
        image_filenames=new_filenames,
        sensor_IDs=[0] * len(new_filenames),
        local_to_epsg_4978_transform=initial.get_local_to_epsg_4978_transform(),
    )
