"""Shared constants for geograypher-tpu.

Mirrors the role of the reference's ``geograypher/constants.py``
(/root/reference/geograypher/constants.py:1-129) but is independent of
pyproj/matplotlib example-data plumbing.  CRS identifiers are plain EPSG
integers handled by :mod:`geograypher_tpu.utils.crs`.
"""

from pathlib import Path
from typing import Union

PATH_TYPE = Union[str, Path]

# EPSG codes (reference constants.py:27-28)
LAT_LON_EPSG = 4326
EARTH_CENTERED_EARTH_FIXED_EPSG = 4978

# Aliases matching the reference's naming so ported call-sites read naturally
LAT_LON_CRS = LAT_LON_EPSG
EARTH_CENTERED_EARTH_FIXED_CRS = EARTH_CENTERED_EARTH_FIXED_EPSG

# Texture value for faces/vertices with no data
NULL_TEXTURE_FLOAT_VALUE = float("nan")
NULL_TEXTURE_INT_VALUE = 255

# Default sentinel for pixels whose ray hits no mesh face
BACKGROUND_FACE_ID = -1

# Spatial chunking default, matches reference constants.py:129
CHUNKED_MESH_BUFFER_DIST_METERS = 125.0

# Default cache folder for expensive intermediates (pix2face maps, distortion
# maps).  The reference uses ubelt's appdir (reference constants.py); we keep
# it inside the working tree by default so nothing leaks outside the repo.
CACHE_FOLDER = Path.home() / ".cache" / "geograypher_tpu"

EXAMPLE_INTRINSICS = {
    "f": 1000.0,
    "cx": 0.0,
    "cy": 0.0,
    "image_width": 800,
    "image_height": 600,
}

DEFAULT_FRUSTUM_SCALE = 1.0
