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


def assemble_transform(
    rotation: np.ndarray, translation: np.ndarray, scale: float = 1.0
) -> np.ndarray:
    """Homogeneous 4x4 from a rotation, translation and uniform scale.

    The rotation must be special-orthogonal (|det - 1| <= 1e-8); scale is
    folded into the linear block.  Behavior matches the transform the
    reference builds from Metashape XML (parsing.py:44-69), expressed over
    arrays rather than strings.
    """
    linear = np.asarray(rotation, dtype=np.float64).reshape(3, 3)
    det = float(np.linalg.det(linear))
    if abs(det - 1.0) > 1e-8:
        raise ValueError(
            f"rotation block is not special-orthogonal (det={det!r})"
        )
    out = np.zeros((4, 4), dtype=np.float64)
    out[:3, :3] = linear * float(scale)
    out[:3, 3] = np.asarray(translation, dtype=np.float64).reshape(3)
    out[3, 3] = 1.0
    return out


def make_4x4_transform(
    rotation_str: str, translation_str: str, scale_str: str = "1"
) -> np.ndarray:
    """String-triplet adapter for Metashape XML fields (row-major rotation,
    translation, uniform scale) -> :func:`assemble_transform`."""
    return assemble_transform(
        np.fromstring(rotation_str, sep=" "),
        np.fromstring(translation_str, sep=" "),
        float(scale_str),
    )


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


_NON_DISTORTION_TAGS = frozenset({"resolution", "f", "cx", "cy"})


def _parse_one_sensor(
    sensor, defaults: typing.Optional[dict]
) -> typing.Optional[dict]:
    """Intrinsics dict for a single <sensor> element, or None if the sensor
    is unusable (no adjusted calibration and no defaults to fall back on).
    """
    resolution = sensor[0]
    size = {
        "image_width": int(resolution.get("width")),
        "image_height": int(resolution.get("height")),
    }

    calibration = sensor.find("calibration[@class='adjusted']")
    if calibration is None:
        # Unadjusted sensor: usable only when caller-supplied defaults
        # stand in for the missing calibration.
        return {**size, **defaults} if defaults is not None else None

    params: typing.Dict[str, typing.Any] = {
        **size,
        "f": float(calibration.find("f").text),
        "distortion_params": {
            el.tag: float(el.text)
            for el in calibration
            if el.tag not in _NON_DISTORTION_TAGS
        },
    }
    # Principal point offsets may be omitted from the XML; fall back to the
    # defaults, and reject the sensor if neither source provides them.
    for key in ("cx", "cy"):
        el = calibration.find(key)
        if el is not None:
            params[key] = float(el.text)
        elif defaults is not None and key in defaults:
            params[key] = defaults[key]
        else:
            return None
    return params


def parse_sensors(
    sensors, default_sensor_dict: typing.Optional[dict] = None
) -> typing.Dict[int, typing.Optional[dict]]:
    """Per-sensor-id intrinsics dicts from a Metashape <sensors> element.

    Same accept/reject semantics as the reference parser
    (parsing.py:91-134): sensors that cannot be calibrated map to None and
    their cameras are dropped downstream.
    """
    return {
        int(sensor.get("id")): _parse_one_sensor(sensor, default_sensor_dict)
        for sensor in sensors
    }
