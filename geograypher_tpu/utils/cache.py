"""Hash-keyed disk cache for pix2face maps.

Counterpart of the reference's ubelt-based cache
(meshes/meshes.py:1726-1737): keyed by (mesh hash, camera hash, scale),
cleared on read errors.  The reference stores raw int arrays and reaches
"100s of GBs" (meshes.py:1666-1667); face-id maps are long-run data, so
maps here are RLE-compressed through the native codec (falling back to
npz) — typically 10-50x smaller.
"""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from geograypher_tpu.constants import CACHE_FOLDER, PATH_TYPE

logger = logging.getLogger(__name__)

MAGIC = b"GGRLE001"


def _key_path(cache_folder: Path, name: str, depends: list) -> Path:
    hasher = hashlib.sha256()
    for d in depends:
        hasher.update(repr(d).encode())
    return Path(cache_folder) / f"{name}_{hasher.hexdigest()[:32]}.ggr"


def save_pix2face(
    pix2face: np.ndarray,
    name: str,
    depends: list,
    cache_folder: PATH_TYPE = CACHE_FOLDER,
) -> Path:
    from geograypher_tpu import native
    from geograypher_tpu.utils.files import ensure_folder

    ensure_folder(cache_folder)
    path = _key_path(Path(cache_folder), name, depends)
    arr = np.ascontiguousarray(pix2face, dtype=np.int32)
    enc = native.rle_encode(arr)
    if enc is not None:
        # layout: MAGIC | ndim (int64) | shape (ndim int64) | payload
        with open(path, "wb") as fh:
            fh.write(MAGIC)
            fh.write(np.int64(arr.ndim).tobytes())
            fh.write(np.asarray(arr.shape, dtype=np.int64).tobytes())
            fh.write(enc)
        return path
    path = path.with_suffix(".npz")
    np.savez_compressed(path, pix2face=arr)
    return path


def load_pix2face(
    name: str,
    depends: list,
    cache_folder: PATH_TYPE = CACHE_FOLDER,
) -> Optional[np.ndarray]:
    """Load a cached map; on any error the entry is cleared (the
    reference's on_error='clear' behavior) and None returned."""
    from geograypher_tpu import native

    path = _key_path(Path(cache_folder), name, depends)
    npz = path.with_suffix(".npz")
    try:
        if path.exists():
            raw = path.read_bytes()
            if raw[:8] != MAGIC:
                raise ValueError("bad magic")
            ndim = int(np.frombuffer(raw[8:16], dtype=np.int64)[0])
            shape = tuple(
                np.frombuffer(raw[16 : 16 + 8 * ndim], dtype=np.int64)
            )
            dec = native.rle_decode(
                raw[16 + 8 * ndim :], int(np.prod(shape))
            )
            if dec is None:
                raise ValueError("native decode unavailable")
            return dec.reshape(shape)
        if npz.exists():
            return np.load(npz)["pix2face"]
    except Exception as exc:  # corrupt entry: clear and recompute
        logger.warning("clearing corrupt cache entry %s (%s)", path, exc)
        for p in (path, npz):
            try:
                p.unlink(missing_ok=True)
            except OSError:
                pass
    return None
