"""Camera model core: pytree camera batches + batched projection math.

TPU-first redesign of the reference's ``PhotogrammetryCamera`` /
``PhotogrammetryCameraSet`` (/root/reference/geograypher/cameras/cameras.py:55,661).
Instead of a list of Python objects, a :class:`CameraBatch` is a pytree of
stacked arrays so every geometric operation is a single vmapped/jitted
computation.  This also supplies the batched "project points -> pixels +
validity" path that exists only as dead torch-referencing code in the
reference (cameras.py:328-444).

Conventions (matching the reference):

* ``cam_to_world`` is a 4x4 homogeneous transform in the photogrammetry
  local frame.  The camera looks along +Z; image up is -Y
  (cameras.py:446-478), i.e. standard CV axes: x -> right (columns),
  y -> down (rows), z -> forward.
* Intrinsics are ``f`` (pixels) and principal-point offsets ``cx, cy``
  measured FROM THE IMAGE CENTER (cameras.py:66-77).
* Pixel (i, j) = (row, col); the continuous pixel coordinate of a 3D point
  is ``col = f*X/Z + W/2 + cx``, ``row = f*Y/Z + H/2 + cy``
  (cameras.py:588-596).  The *ideal* projection used for rasterization
  ignores (cx, cy), matching the reference's VTK camera which only sets the
  vertical FOV (cameras.py:446-463); the principal point and lens distortion
  are applied by the distortion warp stage instead
  (derived_cameras.py:188-196).
* A batch's ``local_to_epsg_4978`` 4x4 maps the local frame to ECEF
  (cameras.py:674,911).
"""

from __future__ import annotations

import collections
import dataclasses
import hashlib
import logging
from pathlib import Path
from typing import Callable as typing_Callable
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.utils import crs as crs_utils
from geograypher_tpu.utils.geometric import (
    angle_between,
    projection_onto_spanned_plane,
)

# Distortion parameter vector layout (Brown-Conrady, Metashape order).
# COLMAP SIMPLE_RADIAL's single k maps onto slot "k1" after rescaling, see
# cameras/colmap.py.
DISTORTION_KEYS = ("k1", "k2", "k3", "k4", "p1", "p2", "b1", "b2")


def distortion_dict_to_vector(params: Optional[Dict[str, float]]) -> np.ndarray:
    vec = np.zeros((len(DISTORTION_KEYS),), dtype=np.float64)
    if params:
        unknown = set(params) - set(DISTORTION_KEYS)
        if unknown:
            raise ValueError(f"Unexpected distortion params found: {sorted(unknown)}")
        for i, k in enumerate(DISTORTION_KEYS):
            vec[i] = float(params.get(k, 0.0))
    return vec


def distortion_vector_to_dict(vec: np.ndarray) -> Dict[str, float]:
    return {
        k: float(v) for k, v in zip(DISTORTION_KEYS, np.asarray(vec)) if v != 0.0
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraBatch:
    """A batch of N cameras sharing one image size, as stacked arrays.

    Array fields are pytree leaves (shardable / vmappable); image size is
    static metadata.  All cameras in a batch must share (width, height) —
    :class:`CameraSet` groups heterogeneous sensors into multiple batches.
    """

    cam_to_world: jax.Array  # (N, 4, 4) float32
    world_to_cam: jax.Array  # (N, 4, 4) float32
    f: jax.Array  # (N,) float32, focal length in pixels
    cx: jax.Array  # (N,) float32, principal point offset from center
    cy: jax.Array  # (N,) float32
    distortion: jax.Array  # (N, 8) float32, DISTORTION_KEYS order
    image_width: int = dataclasses.field(metadata=dict(static=True))
    image_height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_cameras(self) -> int:
        return self.cam_to_world.shape[0]

    @property
    def positions(self) -> jax.Array:
        """(N, 3) camera centers in the local frame."""
        return self.cam_to_world[:, :3, 3]

    def scaled(self, image_scale: float) -> "CameraBatch":
        """Batch at a downscaled image resolution.

        Matches the reference's image-scale semantics
        (cameras.py:179-198): width/height are rounded with int(), and
        intrinsics scale linearly.
        """
        if image_scale == 1.0:
            return self
        s = float(image_scale)
        # radial/tangential coefficients act on normalized coordinates
        # (scale-invariant), but the affinity terms b1/b2 are PIXEL units
        # like f/cx/cy and must scale with the image
        dist = self.distortion
        pix_scale = jnp.asarray(
            [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, s, s], dist.dtype
        )
        return dataclasses.replace(
            self,
            f=self.f * s,
            cx=self.cx * s,
            cy=self.cy * s,
            distortion=dist * pix_scale,
            image_width=int(self.image_width * s),
            image_height=int(self.image_height * s),
        )


def make_camera_batch(
    cam_to_world: np.ndarray,
    f,
    cx,
    cy,
    image_width: int,
    image_height: int,
    distortion: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> CameraBatch:
    """Build a CameraBatch from host arrays; computes world_to_cam in f64."""
    c2w = np.asarray(cam_to_world, dtype=np.float64)
    if c2w.ndim == 2:
        c2w = c2w[None]
    n = c2w.shape[0]
    w2c = np.linalg.inv(c2w)
    f = np.broadcast_to(np.asarray(f, dtype=np.float64), (n,))
    cx = np.broadcast_to(np.asarray(cx, dtype=np.float64), (n,))
    cy = np.broadcast_to(np.asarray(cy, dtype=np.float64), (n,))
    if distortion is None:
        distortion = np.zeros((n, len(DISTORTION_KEYS)))
    distortion = np.broadcast_to(
        np.asarray(distortion, dtype=np.float64), (n, len(DISTORTION_KEYS))
    )
    return CameraBatch(
        cam_to_world=jnp.asarray(c2w, dtype=dtype),
        world_to_cam=jnp.asarray(w2c, dtype=dtype),
        f=jnp.asarray(f, dtype=dtype),
        cx=jnp.asarray(cx, dtype=dtype),
        cy=jnp.asarray(cy, dtype=dtype),
        distortion=jnp.asarray(distortion, dtype=dtype),
        image_width=int(image_width),
        image_height=int(image_height),
    )


# ---------------------------------------------------------------------------
# Batched projection math (pure JAX, jit/vmap/shard_map friendly)
# ---------------------------------------------------------------------------


def world_to_camera_frame(points: jax.Array, world_to_cam: jax.Array) -> jax.Array:
    """Transform (V, 3) local-frame points into one camera's frame.

    Args:
        points: (V, 3) points in the photogrammetry local frame.
        world_to_cam: (4, 4) transform.

    Returns:
        (V, 3) points in the camera frame (+Z forward).
    """
    rot = world_to_cam[:3, :3]
    t = world_to_cam[:3, 3]
    rotated = jax.lax.dot_general(
        points, rot, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    return rotated + t


def camera_frame_to_pixels(
    pts_cam: jax.Array,
    f: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    image_width: int,
    image_height: int,
    use_principal_point: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pinhole projection of camera-frame points to pixel coordinates.

    Returns (xy, depth, valid) where ``xy`` is (V, 2) continuous
    ``(col, row)`` coordinates, ``depth`` is the +Z camera depth, and
    ``valid`` marks points in front of the camera and inside the image.
    Fixes the reference's dead torch path (cameras.py:328-444).
    """
    z = pts_cam[:, 2]
    eps = jnp.asarray(1e-12, pts_cam.dtype)
    safe_z = jnp.where(jnp.abs(z) < eps, eps, z)
    px = f * pts_cam[:, 0] / safe_z + image_width / 2.0
    py = f * pts_cam[:, 1] / safe_z + image_height / 2.0
    if use_principal_point:
        px = px + cx
        py = py + cy
    xy = jnp.stack([px, py], axis=-1)
    in_front = z > 0
    in_image = (
        (px >= 0) & (px < image_width) & (py >= 0) & (py < image_height)
    )
    return xy, z, in_front & in_image


def project_points(
    batch: CameraBatch,
    points: jax.Array,
    use_principal_point: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project (V, 3) points through all cameras in the batch.

    Returns:
        xy: (N, V, 2) pixel (col, row) coordinates
        depth: (N, V) camera-frame depth
        valid: (N, V) in-front & in-image mask
    """

    def one(w2c, f, cx, cy):
        pts_cam = world_to_camera_frame(points, w2c)
        return camera_frame_to_pixels(
            pts_cam,
            f,
            cx,
            cy,
            batch.image_width,
            batch.image_height,
            use_principal_point=use_principal_point,
        )

    return jax.vmap(one)(batch.world_to_cam, batch.f, batch.cx, batch.cy)


def pixel_rays(
    batch: CameraBatch,
    pixel_coords_ij: jax.Array,
    line_length: float = 10.0,
) -> Tuple[jax.Array, jax.Array]:
    """Rays from each camera center through given (i, j) pixels.

    Vectorized equivalent of the reference's ``PhotogrammetryCamera.cast_rays``
    (cameras.py:574-631): direction through pixel (i, j) is the normalized
    ``((x - ppx)/f, (y - ppy)/f, 1)`` with the FULL principal point
    ``pp = (W/2 + cx, H/2 + cy)``, scaled to ``line_length`` and expressed in
    the local frame.

    Args:
        batch: cameras.
        pixel_coords_ij: (N, P, 2) per-camera (row, col) pixel coords.
        line_length: world-frame length of each returned segment.

    Returns:
        starts: (N, P, 3) camera centers (broadcast)
        ends: (N, P, 3) segment endpoints in the local frame
    """

    def one(c2w, f, cx, cy, pix_ij):
        xy = jnp.flip(pix_ij, axis=-1)  # (P, 2) -> (x, y)
        ppx = batch.image_width / 2.0 + cx
        ppy = batch.image_height / 2.0 + cy
        dirs = jnp.stack(
            [
                (xy[:, 0] - ppx) / f,
                (xy[:, 1] - ppy) / f,
                jnp.ones_like(xy[:, 0]),
            ],
            axis=-1,
        )
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rot = c2w[:3, :3]
        origin = c2w[:3, 3]
        world_dirs = jax.lax.dot_general(
            dirs, rot, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )
        starts = jnp.broadcast_to(origin, world_dirs.shape)
        ends = starts + world_dirs * line_length
        return starts, ends

    return jax.vmap(one)(
        batch.cam_to_world, batch.f, batch.cx, batch.cy, pixel_coords_ij
    )


# ---------------------------------------------------------------------------
# Host-side camera set (grouping, parsing glue, geospatial metadata)
# ---------------------------------------------------------------------------


class CameraSet:
    """Ordered collection of cameras in one local frame.

    Host-side counterpart of the reference's ``PhotogrammetryCameraSet``
    (cameras.py:661).  Stores per-camera metadata (filenames, sensor ids,
    lon/lat) in numpy/python and exposes the device-side
    :class:`CameraBatch` per sensor group.
    """

    def __init__(
        self,
        cam_to_world_transforms: Sequence[np.ndarray],
        intrinsic_params_per_sensor_type: Dict[int, Optional[dict]] = None,
        image_filenames: Optional[Sequence[Optional[PATH_TYPE]]] = None,
        lon_lats: Optional[Sequence[Optional[Tuple[float, float]]]] = None,
        image_folder: Optional[PATH_TYPE] = None,
        sensor_IDs: Optional[Sequence[int]] = None,
        validate_images: bool = False,
        local_to_epsg_4978_transform: Optional[np.ndarray] = None,
    ):
        n = len(cam_to_world_transforms)
        if intrinsic_params_per_sensor_type is None:
            from geograypher_tpu.constants import EXAMPLE_INTRINSICS

            intrinsic_params_per_sensor_type = {0: dict(EXAMPLE_INTRINSICS)}
        if sensor_IDs is None:
            sensor_IDs = [sorted(intrinsic_params_per_sensor_type)[0]] * n
        if image_filenames is None:
            image_filenames = [None] * n
        if lon_lats is None:
            lon_lats = [None] * n

        # Drop cameras whose sensor has no calibration (reference
        # cameras.py:770-772) or whose image file is missing when
        # validate_images is set (cameras.py:746-760).
        keep = []
        for i in range(n):
            sensor = intrinsic_params_per_sensor_type.get(sensor_IDs[i])
            if sensor is None:
                continue
            if validate_images:
                fname = image_filenames[i]
                if fname is None or not Path(fname).exists():
                    continue
            keep.append(i)

        self.cam_to_world_transforms = [
            np.asarray(cam_to_world_transforms[i], dtype=np.float64) for i in keep
        ]
        self.image_filenames = [
            Path(image_filenames[i]) if image_filenames[i] is not None else None
            for i in keep
        ]
        self.lon_lats = [lon_lats[i] for i in keep]
        self.sensor_IDs = [sensor_IDs[i] for i in keep]
        self.sensors = dict(intrinsic_params_per_sensor_type)
        self.image_folder = Path(image_folder) if image_folder is not None else None
        self.local_to_epsg_4978_transform = (
            np.asarray(local_to_epsg_4978_transform, dtype=np.float64)
            if local_to_epsg_4978_transform is not None
            else None
        )
        self._batch_cache: Dict[Tuple, CameraBatch] = {}

    # -- basics -----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.cam_to_world_transforms)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return self.get_subset_cameras(range(*idx.indices(len(self))))
        return self.get_subset_cameras([idx])

    def get_local_to_epsg_4978_transform(self):
        return self.local_to_epsg_4978_transform

    def get_subset_cameras(self, indices) -> "CameraSet":
        indices = [int(i) for i in indices]
        sub = CameraSet.__new__(CameraSet)
        sub.cam_to_world_transforms = [self.cam_to_world_transforms[i] for i in indices]
        sub.image_filenames = [self.image_filenames[i] for i in indices]
        sub.lon_lats = [self.lon_lats[i] for i in indices]
        sub.sensor_IDs = [self.sensor_IDs[i] for i in indices]
        sub.sensors = self.sensors
        sub.image_folder = self.image_folder
        sub.local_to_epsg_4978_transform = self.local_to_epsg_4978_transform
        sub._batch_cache = {}
        return sub

    def get_subset_by_folder(self, folder_names) -> "CameraSet":
        """Cameras whose image path contains one of the folders
        (reference cameras.py:819)."""
        folders = [str(f) for f in np.atleast_1d(folder_names)]
        idx = [
            i
            for i, f in enumerate(self.image_filenames)
            if f is not None and any(fol in str(f.parent) for fol in folders)
        ]
        return self.get_subset_cameras(idx)

    def get_subset_by_regex(self, pattern: str) -> "CameraSet":
        """Cameras whose filename matches the regex (reference cameras.py:838)."""
        import re

        prog = re.compile(pattern)
        idx = [
            i
            for i, f in enumerate(self.image_filenames)
            if f is not None and prog.search(str(f))
        ]
        return self.get_subset_cameras(idx)

    def get_subset_every_nth(self, n: int) -> "CameraSet":
        return self.get_subset_cameras(range(0, len(self), max(int(n), 1)))

    def export_images(
        self, output_folder: PATH_TYPE, copy: bool = False
    ) -> None:
        """Symlink (or copy) each camera's image into a folder, preserving
        names (reference cameras.py:928-950)."""
        import os
        import shutil

        from geograypher_tpu.utils.files import ensure_containing_folder

        for i in range(len(self)):
            src = self.get_image_filename(i, absolute=True)
            if src is None:
                continue
            dst = Path(output_folder) / src.name
            ensure_containing_folder(dst)
            if copy:
                try:
                    shutil.copy(src, dst)
                except FileNotFoundError:
                    logging.getLogger(__name__).warning(
                        "Could not find %s", src
                    )
            else:
                if not dst.exists():
                    os.symlink(src, dst)

    def get_subset_ROI(
        self,
        ROI,
        buffer_radius: float = 0.0,
        is_geospatial: Optional[bool] = None,
    ) -> "CameraSet":
        """Cameras located within (a buffer of) the ROI geometry
        (reference cameras.py:1207-1273).

        Geospatial ROIs are compared against camera lon/lats in the ROI's
        projected CRS; non-geospatial ROIs against local-frame locations.
        """
        from geograypher_tpu.utils.vector import (
            Polygon,
            VectorData,
            buffer_polygons,
        )

        if isinstance(ROI, Polygon):
            ROI = VectorData([ROI], epsg=4326 if is_geospatial else None)
        elif not isinstance(ROI, VectorData):
            ROI = VectorData.read_file(ROI)
        if is_geospatial is None:
            is_geospatial = ROI.epsg is not None

        if is_geospatial:
            ROI = ROI.ensure_projected()
            lon_lats = self.get_lon_lat_coords()
            lla = np.array([[ll[1], ll[0], 0.0] for ll in lon_lats])
            pts = crs_utils.transform_points(lla, 4326, ROI.epsg)[:, :2]
        else:
            pts = self.get_camera_locations()[:, :2]

        polys = [g for g in ROI.geometries if isinstance(g, Polygon)]
        if buffer_radius:
            polys = buffer_polygons(polys, buffer_radius)
        inside = np.zeros(len(pts), dtype=bool)
        for p in polys:
            inside |= p.contains_points(pts)
        return self.get_subset_cameras(np.where(inside)[0])

    def get_image_filename(self, index: int, absolute: bool = True):
        f = self.image_filenames[index]
        if f is None:
            return None
        return Path(f).absolute() if absolute else Path(f)

    def find_missing_images(self) -> List[Path]:
        return [
            f
            for f in self.image_filenames
            if f is not None and not Path(f).exists()
        ]

    # -- geometry ---------------------------------------------------------

    def get_camera_locations(self) -> np.ndarray:
        """(N, 3) camera centers in the local frame."""
        if len(self) == 0:
            return np.zeros((0, 3))
        return np.stack(
            [t[:3, 3] / t[3, 3] for t in self.cam_to_world_transforms], axis=0
        )

    def get_lon_lat_coords(self) -> List[Optional[Tuple[float, float]]]:
        """Per-camera (lon, lat); derived from transforms if unset
        (reference derived_cameras.py:112-137)."""
        if all(ll is not None for ll in self.lon_lats):
            return list(self.lon_lats)
        if self.local_to_epsg_4978_transform is None:
            return list(self.lon_lats)
        locs = self.get_camera_locations()
        hom = np.concatenate([locs, np.ones((len(locs), 1))], axis=1)
        ecef = (self.local_to_epsg_4978_transform @ hom.T).T[:, :3]
        lat, lon, _ = crs_utils.ecef_to_lla(ecef[:, 0], ecef[:, 1], ecef[:, 2])
        self.lon_lats = list(zip(lon, lat))
        return list(self.lon_lats)

    def get_camera_view_angles(
        self,
        indices: Optional[Sequence[int]] = None,
        in_deg: bool = True,
    ) -> np.ndarray:
        """(N, 2) off-nadir (pitch, yaw) angles per camera, computed
        geometrically from the photogrammetry result (reference
        cameras.py:244-326, vectorized over the whole set).

        Pitch is the view vector's tilt from nadir within the camera's
        up/nadir plane, yaw within the right/nadir plane, both measured in
        a local ENU-aligned projected (UTM) frame.  Requires a
        georeferenced set (local->ECEF transform).
        """
        if self.local_to_epsg_4978_transform is None:
            raise ValueError(
                "View angles need a georeferenced camera set "
                "(local_to_epsg_4978_transform is None)"
            )
        if indices is None:
            indices = range(len(self))
        # origin, one unit along view (+Z), up (-Y) and right (+X)
        probes = np.array(
            [[0, 0, 0, 1], [0, 0, 1, 1], [0, -1, 0, 1], [1, 0, 0, 1]],
            dtype=np.float64,
        ).T
        c2w = np.stack(
            [self.cam_to_world_transforms[i] for i in indices], axis=0
        )
        ecef = np.einsum(
            "ij,njk->nik", self.local_to_epsg_4978_transform, c2w @ probes
        )
        ecef = ecef[:, :3].transpose(0, 2, 1).reshape(-1, 3)  # (N*4, 3)
        lat, lon, alt = crs_utils.ecef_to_lla(
            ecef[:, 0], ecef[:, 1], ecef[:, 2]
        )
        utm = crs_utils.utm_epsg_for(np.mean(lat), np.mean(lon))
        enu = crs_utils.transform_points(
            np.stack([lat, lon, alt], axis=1), 4326, utm
        ).reshape(-1, 4, 3)

        view = enu[:, 1] - enu[:, 0]
        up = enu[:, 2] - enu[:, 0]
        right = enu[:, 3] - enu[:, 0]
        nadir = np.array([0.0, 0.0, -1.0])
        pitch = angle_between(
            projection_onto_spanned_plane(view, up, nadir), nadir
        )
        yaw = angle_between(
            projection_onto_spanned_plane(view, right, nadir), nadir
        )
        out = np.stack([pitch, yaw], axis=1)
        return np.rad2deg(out) if in_deg else out

    def get_camera_hash(self, include_image_hash: bool = False) -> str:
        """Content hash of the set's geometry, INCLUDING distortion
        parameters (reference cameras.py:104-124 hashes them too): this
        hash keys the pix2face disk cache, and a distortion-warped map is
        stale the moment any coefficient changes."""

        def canonical(v):
            if isinstance(v, dict):
                return tuple(sorted((k, canonical(x)) for k, x in v.items()))
            if isinstance(v, (list, tuple, np.ndarray)):
                return tuple(canonical(x) for x in np.asarray(v).reshape(-1))
            if isinstance(v, (np.floating, np.integer)):
                return v.item()
            return v

        hasher = hashlib.sha256()
        for i, t in enumerate(self.cam_to_world_transforms):
            hasher.update(np.ascontiguousarray(t).tobytes())
            sensor = self.sensors[self.sensor_IDs[i]]
            hasher.update(
                repr(sorted((k, canonical(v)) for k, v in sensor.items())).encode()
            )
            if include_image_hash and self.image_filenames[i] is not None:
                hasher.update(str(self.image_filenames[i]).encode())
        return hasher.hexdigest()

    # -- batching ---------------------------------------------------------

    def sensor_groups(self) -> Dict[Tuple[int, int], List[int]]:
        """Camera indices grouped by (width, height) so each group forms a
        uniformly-shaped CameraBatch."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, sid in enumerate(self.sensor_IDs):
            s = self.sensors[sid]
            key = (int(s["image_width"]), int(s["image_height"]))
            groups.setdefault(key, []).append(i)
        return groups

    def get_camera_batch(
        self, indices: Optional[Sequence[int]] = None, image_scale: float = 1.0
    ) -> CameraBatch:
        """Stacked CameraBatch for the given indices (default: all).

        All selected cameras must share an image size.
        """
        if indices is None:
            indices = list(range(len(self)))
        indices = tuple(int(i) for i in indices)
        key = (indices, float(image_scale))
        if key in self._batch_cache:
            return self._batch_cache[key]

        sizes = {
            (
                int(self.sensors[self.sensor_IDs[i]]["image_width"]),
                int(self.sensors[self.sensor_IDs[i]]["image_height"]),
            )
            for i in indices
        }
        if len(sizes) != 1:
            raise ValueError(
                f"Cameras with mixed image sizes {sizes} cannot share a batch; "
                "use sensor_groups() to split them"
            )
        (w, h), = sizes
        c2w = np.stack([self.cam_to_world_transforms[i] for i in indices], axis=0)
        f = np.array([self.sensors[self.sensor_IDs[i]]["f"] for i in indices])
        cx = np.array([self.sensors[self.sensor_IDs[i]].get("cx", 0.0) for i in indices])
        cy = np.array([self.sensors[self.sensor_IDs[i]].get("cy", 0.0) for i in indices])
        dist = np.stack(
            [
                distortion_dict_to_vector(
                    self.sensors[self.sensor_IDs[i]].get("distortion_params")
                )
                for i in indices
            ],
            axis=0,
        )
        batch = make_camera_batch(c2w, f, cx, cy, w, h, dist)
        if image_scale != 1.0:
            batch = batch.scaled(image_scale)
        self._batch_cache[key] = batch
        return batch

    # -- detection triangulation -------------------------------------------

    def get_local_scale(self) -> float:
        """Meters per local unit: cbrt of the local->ECEF determinant
        (reference utils/geometric.py:97-113)."""
        t = self.local_to_epsg_4978_transform
        if t is None:
            return 1.0
        return float(np.cbrt(np.linalg.det(t[:3, :3])))

    def calc_line_segments(
        self,
        detector,
        boundaries=None,
        ray_length_local: float = 1e3,
        out_dir=None,
        limit_ray_length_local: Optional[float] = None,
        limit_angle_from_vert: Optional[float] = None,
    ):
        """Detection centers -> world-frame rays, filtered and clipped
        (reference cameras.py:1483-1596).

        Steps: per camera, look up detection centers, cast rays through
        them (batched), optionally drop rays too far from vertical,
        optionally clip between (ceiling, floor) covering meshes, and
        optionally cap the length from the origin.
        """
        from geograypher_tpu.cameras.core import pixel_rays as _pixel_rays

        all_starts, all_ends, all_ids = [], [], []
        for cam_ind in range(len(self)):
            fname = str(self.get_image_filename(cam_ind))
            centers = np.asarray(detector.get_detection_centers(fname))
            if centers.size == 0:
                continue
            batch = self.get_camera_batch([cam_ind])
            starts, ends = _pixel_rays(
                batch,
                jnp.asarray(centers[None], jnp.float32),
                line_length=ray_length_local,
            )
            starts = np.asarray(starts)[0]
            ends = np.asarray(ends)[0]
            all_starts.append(starts)
            all_ends.append(ends)
            all_ids.append(np.full(len(starts), cam_ind))
        if not all_starts:
            data = {
                "ray_starts": np.zeros((0, 3)),
                "ray_ends": np.zeros((0, 3)),
                "ray_IDs": np.zeros((0,), int),
            }
        else:
            starts = np.concatenate(all_starts)
            ends = np.concatenate(all_ends)
            ids = np.concatenate(all_ids)
            keep = np.ones(len(starts), dtype=bool)
            if limit_angle_from_vert is not None:
                dirs = ends - starts
                dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
                angle = np.arccos(np.clip(-dirs[:, 2], -1.0, 1.0))
                keep &= angle <= limit_angle_from_vert
            starts, ends, ids = starts[keep], ends[keep], ids[keep]
            origins = starts.copy()
            if boundaries is not None:
                from geograypher_tpu.ops.raycast import clip_line_segments

                (ceil_v, ceil_f), (floor_v, floor_f) = boundaries
                starts, ends, valid = clip_line_segments(
                    starts, ends, ceil_v[ceil_f], floor_v[floor_f]
                )
                valid = np.array(valid)  # writable copy (from device)
            else:
                valid = np.ones(len(starts), dtype=bool)
            if limit_ray_length_local is not None:
                # applies with OR without boundary clipping (the length
                # filter is independent of the covering-mesh clip)
                length = np.linalg.norm(
                    np.asarray(ends) - origins, axis=1
                )
                valid &= length <= limit_ray_length_local
            starts, ends, ids = (
                np.asarray(starts)[valid],
                np.asarray(ends)[valid],
                ids[valid],
            )
            data = {"ray_starts": starts, "ray_ends": ends, "ray_IDs": ids}
        if out_dir is not None:
            path = Path(out_dir) / "line_segments.npz"
            np.savez(path, **data)
            return path
        return data

    def triangulate_detections(
        self,
        detector,
        ray_length_meters: float = 1e3,
        boundaries=None,
        limit_ray_length_meters: Optional[float] = None,
        limit_angle_from_vert: Optional[float] = None,
        similarity_threshold_meters: float = 0.1,
        transform: Optional[typing_Callable] = None,
        louvain_resolution: float = 1.0,
        out_dir: Optional[PATH_TYPE] = None,
    ) -> np.ndarray:
        """Per-image detections -> triangulated 3D object locations
        (reference cameras.py:1275-1480): rays -> pairwise-intersection
        graph -> Louvain communities -> per-community triangulation.

        File-cached per stage in ``out_dir`` (line_segments.npz,
        edge_weights.json, communities.npz), resuming like the reference.
        Returns (M, 3) (lat, lon, alt) when georeferenced, else local
        points.
        """
        import json

        from geograypher_tpu.ops.triangulate import (
            calc_communities,
            calc_graph_weights,
        )

        if out_dir is not None:
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
        scale = self.get_local_scale()

        seg_path = out_dir / "line_segments.npz" if out_dir else None
        if seg_path is not None and seg_path.is_file():
            data = dict(np.load(seg_path))
        else:
            data = self.calc_line_segments(
                detector,
                boundaries=boundaries,
                ray_length_local=ray_length_meters / scale,
                limit_ray_length_local=(
                    limit_ray_length_meters / scale
                    if limit_ray_length_meters is not None
                    else None
                ),
                limit_angle_from_vert=limit_angle_from_vert,
                out_dir=out_dir,
            )
            if out_dir is not None:
                data = dict(np.load(data))

        starts, ends, ray_IDs = (
            data["ray_starts"],
            data["ray_ends"],
            data["ray_IDs"],
        )
        edges_path = out_dir / "edge_weights.json" if out_dir else None
        if edges_path is not None and edges_path.is_file():
            edge_weights = [tuple(e) for e in json.load(open(edges_path))]
        else:
            edge_weights = calc_graph_weights(
                starts,
                ends,
                ray_IDs,
                similarity_threshold=similarity_threshold_meters / scale,
                transform=transform,
                out_dir=out_dir,
            )
            if out_dir is not None:
                edge_weights = [tuple(e) for e in json.load(open(edge_weights))]

        comm_path = out_dir / "communities.npz" if out_dir else None
        if comm_path is not None and comm_path.is_file():
            result = dict(np.load(comm_path))
        else:
            result = calc_communities(
                starts,
                ends,
                edge_weights,
                louvain_resolution=louvain_resolution,
                transform_to_epsg_4978=self.local_to_epsg_4978_transform,
                out_dir=out_dir,
            )
            if out_dir is not None:
                result = dict(np.load(result))

        if "community_points_latlon" in result:
            return result["community_points_latlon"]
        return result["community_points"]

    # -- images -----------------------------------------------------------

    #: raw images kept in memory per set (reference cameras.py:154-177
    #: caches per camera); bounded so survey-scale sets stay in RAM
    image_cache_size: int = 16

    def get_image_by_index(self, index: int, image_scale: float = 1.0) -> np.ndarray:
        """Load the image for camera ``index`` (reference cameras.py:154-198).

        Raw (unscaled) images are LRU-cached per set so aggregation passes
        touching each view repeatedly pay one disk read; resizing is done
        per call (never cached), like the reference.
        """
        from geograypher_tpu.utils.io import read_image_or_numpy

        fname = self.get_image_filename(index)
        if fname is None:
            raise FileNotFoundError(f"Camera {index} has no image filename")
        cache = getattr(self, "_image_cache", None)
        if cache is None:
            cache = self._image_cache = collections.OrderedDict()
        key = str(fname)
        if key in cache:
            cache.move_to_end(key)
            img = cache[key]
        else:
            img = read_image_or_numpy(fname)
            if self.image_cache_size > 0:
                cache[key] = img
                while len(cache) > self.image_cache_size:
                    cache.popitem(last=False)
        if image_scale != 1.0:
            import cv2

            new_w = int(img.shape[1] * image_scale)
            new_h = int(img.shape[0] * image_scale)
            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_AREA)
        return img

    def n_image_channels(self) -> int:
        return 3
