"""Decorator camera set: images pass through a Segmentor.

Port of the reference's ``SegmentorPhotogrammetryCameraSet``
(/root/reference/geograypher/cameras/segmentor.py:10-77): wraps any
CameraSet so ``get_image_by_index`` returns the segmentor's prediction
instead of the raw image, keeping the mesh aggregation engine agnostic to
whether it consumes RGB, one-hot labels, detection rasters or image-id
rasters.
"""

from __future__ import annotations

from geograypher_tpu.cameras.core import CameraSet
from geograypher_tpu.predictors.segmentors import Segmentor


class SegmentorCameraSet(CameraSet):
    def __init__(self, base_camera_set: CameraSet, segmentor: Segmentor):
        self.base = base_camera_set
        self.segmentor = segmentor
        # share the base set's metadata (no copies)
        self.cam_to_world_transforms = base_camera_set.cam_to_world_transforms
        self.image_filenames = base_camera_set.image_filenames
        self.lon_lats = base_camera_set.lon_lats
        self.sensor_IDs = base_camera_set.sensor_IDs
        self.sensors = base_camera_set.sensors
        self.image_folder = base_camera_set.image_folder
        self.local_to_epsg_4978_transform = (
            base_camera_set.local_to_epsg_4978_transform
        )
        self._batch_cache = {}

    def get_subset_cameras(self, indices):
        return SegmentorCameraSet(
            self.base.get_subset_cameras(indices), self.segmentor
        )

    def get_image_by_index(self, index: int, image_scale: float = 1.0):
        """Return the segmented prediction for camera ``index``
        (reference cameras/segmentor.py:33-47)."""
        fname = self.image_filenames[index]
        raw = None
        if (
            getattr(self.segmentor, "needs_image", False)
            and fname is not None
            and fname.exists()
        ):
            # only pixel-driven segmentors pay the disk read + resize
            # (reference dont_load_base_image=True default)
            raw = self.base.get_image_by_index(index, image_scale)
        return self.segmentor.segment_image(
            raw, filename=fname, image_scale=image_scale, index=index
        )

    def n_image_channels(self) -> int:
        return self.segmentor.num_classes or 1

    def get_subset_with_valid_segmentation(self):
        """Cameras whose segmentation succeeds (reference
        cameras/segmentor.py:60-76)."""
        ok = []
        for i in range(len(self)):
            try:
                self.get_image_by_index(i, image_scale=0.25)
                ok.append(i)
            except Exception:
                continue
        return self.get_subset_cameras(ok)
