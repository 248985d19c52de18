"""Metashape camera-export parser -> :class:`CameraSet`.

Behavioral equivalent of the reference's ``MetashapeCameraSet``
(/root/reference/geograypher/cameras/derived_cameras.py:15-196): parses the
camera XML (sensors, per-camera and grouped transforms, chunk->ECEF
component transform), rebases image paths, and derives per-camera lon/lat
from the OPTIMIZED poses rather than EXIF.  Distortion handling lives in
:mod:`geograypher_tpu.cameras.distortion` (Brown-Conrady, Metashape manual
"Frame Cameras" model).
"""

from __future__ import annotations

import typing
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

from geograypher_tpu.cameras.core import CameraSet
from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.utils import crs as crs_utils
from geograypher_tpu.utils.parsing import parse_sensors, parse_transform_metashape


def _collect_camera(
    camera_el,
    image_folder,
    cam_to_world_transforms,
    image_filenames,
    sensor_IDs,
    original_image_folder=None,
):
    """Append one <camera> element's pose/filename/sensor, skipping unaligned
    cameras (reference derived_cameras.py:16-41)."""
    transform = camera_el.find("transform")
    if transform is None:
        return
    cam_to_world_transforms.append(
        np.fromstring(transform.text, sep=" ").reshape(4, 4)
    )
    image_filename = Path(camera_el.get("label"))
    if original_image_folder is not None:
        image_filename = image_filename.relative_to(original_image_folder)
    image_filenames.append(Path(image_folder, image_filename))
    sensor_IDs.append(int(camera_el.get("sensor_id")))


class MetashapeCameraSet(CameraSet):
    def __init__(
        self,
        camera_file: PATH_TYPE,
        image_folder: PATH_TYPE,
        original_image_folder: typing.Optional[PATH_TYPE] = None,
        validate_images: bool = False,
        default_sensor_params: dict = {"cx": 0.0, "cy": 0.0},
    ):
        tree = ET.parse(camera_file)
        root = tree.getroot()
        chunk = root.find("chunk")
        sensors_dict = parse_sensors(
            chunk.find("sensors"), default_sensor_dict=default_sensor_params
        )

        image_filenames: list = []
        cam_to_world_transforms: list = []
        sensor_IDs: list = []
        for cam_or_group in chunk.find("cameras"):
            members = cam_or_group if cam_or_group.tag == "group" else [cam_or_group]
            for cam in members:
                _collect_camera(
                    cam,
                    image_folder,
                    cam_to_world_transforms,
                    image_filenames,
                    sensor_IDs,
                    original_image_folder=original_image_folder,
                )

        chunk_to_epsg4978 = parse_transform_metashape(camera_file=camera_file)

        if chunk_to_epsg4978 is not None and cam_to_world_transforms:
            # lon/lat from optimized poses (derived_cameras.py:112-137)
            locs = np.stack(
                [t[:, 3] for t in cam_to_world_transforms], axis=0
            )  # (N, 4) homogeneous
            ecef = (chunk_to_epsg4978 @ locs.T).T[:, :3]
            lat, lon, _ = crs_utils.ecef_to_lla(ecef[:, 0], ecef[:, 1], ecef[:, 2])
            lon_lats = list(zip(lon, lat))
        else:
            lon_lats = None

        super().__init__(
            cam_to_world_transforms=cam_to_world_transforms,
            intrinsic_params_per_sensor_type=sensors_dict,
            image_filenames=image_filenames,
            lon_lats=lon_lats,
            image_folder=image_folder,
            sensor_IDs=sensor_IDs,
            validate_images=validate_images,
            local_to_epsg_4978_transform=chunk_to_epsg4978,
        )
