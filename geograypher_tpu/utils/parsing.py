"""Metashape export parsing helpers.

Behavioral port of /root/reference/geograypher/utils/parsing.py (pure XML/
string parsing, no compute).  pyproj CRS objects are replaced by EPSG ints /
WKT strings handled by :mod:`geograypher_tpu.utils.crs`.
"""

from __future__ import annotations

import re
import typing
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np


def parse_metashape_mesh_metadata(
    mesh_metadata_file: typing.Union[str, Path],
) -> typing.Tuple[typing.Optional[str], typing.Optional[np.ndarray]]:
    """Parse the CRS + origin shift from a Metashape mesh-metadata XML
    (reference parsing.py:10-42).

    Returns (crs, shift): ``crs`` is the raw SRS text (WKT or
    "EPSG::<code>" style), ``shift`` an (3,) array or None.
    """
    tree = ET.parse(mesh_metadata_file)
    root = tree.getroot()
    crs_el = root.find("SRS")
    shift_el = root.find("SRSOrigin")
    crs = crs_el.text if crs_el is not None else None
    shift = (
        np.array(shift_el.text.split(","), dtype=float)
        if shift_el is not None
        else None
    )
    return crs, shift


def extract_epsg(crs_text: typing.Optional[str]) -> typing.Optional[int]:
    """Best-effort EPSG code extraction from an SRS string (WKT AUTHORITY
    tail or 'EPSG::NNNN' syntax)."""
    if crs_text is None:
        return None
    m = re.search(r"EPSG[\":,]+(\d+)", crs_text)
    if m:
        codes = re.findall(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', crs_text)
        if codes:
            return int(codes[-1])
        return int(m.group(1))
    return None


def make_4x4_transform(
    rotation_str: str, translation_str: str, scale_str: str = "1"
) -> np.ndarray:
    """4x4 transform from Metashape's string triplet (reference parsing.py:44-69).

    Validates the rotation determinant like the reference (parsing.py:58).
    """
    rotation_np = np.fromstring(rotation_str, sep=" ").reshape(3, 3)
    det = np.linalg.det(rotation_np)
    if not np.isclose(det, 1.0, atol=1e-8, rtol=0):
        raise ValueError(f"Improper rotation matrix with determinant {det}")
    translation_np = np.fromstring(translation_str, sep=" ")
    scale = float(scale_str)
    transform = np.eye(4)
    transform[:3, :3] = rotation_np * scale
    transform[:3, 3] = translation_np
    return transform


def parse_transform_metashape(camera_file) -> typing.Optional[np.ndarray]:
    """Chunk->ECEF 4x4 from a Metashape camera XML (reference parsing.py:71-89)."""
    tree = ET.parse(camera_file)
    root = tree.getroot()
    components = root.find("chunk").find("components")
    if components is None:
        return None
    assert len(components) == 1
    transform = components.find("component").find("transform")
    if transform is None:
        return None
    rotation = transform.find("rotation").text
    translation = transform.find("translation").text
    scale = transform.find("scale").text
    return make_4x4_transform(rotation, translation, scale)


def parse_sensors(
    sensors, default_sensor_dict: typing.Optional[dict] = None
) -> typing.Dict[int, typing.Optional[dict]]:
    """Per-sensor intrinsics dicts from the <sensors> XML element
    (reference parsing.py:91-134).

    A sensor without an adjusted calibration gets the default params if
    provided, else None (its cameras are later dropped).
    """
    sensors_dict: typing.Dict[int, typing.Optional[dict]] = {}
    for sensor in sensors:
        sensor_dict: typing.Optional[dict] = {}
        sensor_dict["image_width"] = int(sensor[0].get("width"))
        sensor_dict["image_height"] = int(sensor[0].get("height"))
        calibration = sensor.find("calibration[@class='adjusted']")
        if calibration is None:
            if default_sensor_dict is not None:
                sensor_dict.update(default_sensor_dict)
            else:
                sensor_dict = None
        else:
            sensor_dict["f"] = float(calibration.find("f").text)
            cx = calibration.find("cx")
            cy = calibration.find("cy")
            try:
                sensor_dict["cx"] = (
                    float(cx.text) if cx is not None else default_sensor_dict["cx"]
                )
                sensor_dict["cy"] = (
                    float(cy.text) if cy is not None else default_sensor_dict["cy"]
                )
                sensor_dict["distortion_params"] = {
                    el.tag: float(el.text)
                    for el in calibration
                    if el.tag not in ("resolution", "f", "cx", "cy")
                }
            except (KeyError, TypeError):
                sensor_dict = None
        sensors_dict[int(sensor.get("id"))] = sensor_dict
    return sensors_dict
