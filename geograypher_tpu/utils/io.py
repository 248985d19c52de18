"""Image / array IO helpers (reference utils/io.py).

Uses imageio + numpy; the reference's skimage.io is unavailable here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from geograypher_tpu.constants import PATH_TYPE


def read_image_or_numpy(filename: PATH_TYPE) -> np.ndarray:
    """Read an image file or .npy array (reference io.py)."""
    filename = Path(filename)
    if filename.suffix.lower() == ".npy":
        return np.load(filename)
    import imageio.v3 as iio

    return np.asarray(iio.imread(filename))


def write_image(filename: PATH_TYPE, image: np.ndarray) -> None:
    from geograypher_tpu.utils.files import ensure_containing_folder

    filename = Path(filename)
    ensure_containing_folder(filename)
    if filename.suffix.lower() == ".npy":
        np.save(filename, image)
        return
    import imageio.v3 as iio

    iio.imwrite(filename, image)
