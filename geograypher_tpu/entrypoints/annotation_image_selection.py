"""determine_minimum_overlapping_images: pick a minimal image subset that
covers the mesh, via set cover over the face x image visibility matrix
(port of /root/reference/geograypher/entrypoints/
annotation_image_selection.py:17-240; SetCoverPy is replaced by a greedy
set-cover, which carries the standard ln(n) approximation guarantee)."""

from __future__ import annotations

import argparse
import shutil
import typing

import numpy as np

from geograypher_tpu.cameras.metashape import MetashapeCameraSet
from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.meshes.sparse import aggregate_index_predictions
from geograypher_tpu.predictors.segmentors import ImageIDSegmentor
from geograypher_tpu.utils.files import ensure_folder


def greedy_set_cover(matrix: np.ndarray) -> typing.List[int]:
    """Greedy set cover: matrix is (n_elements, n_sets) boolean; returns
    set indices covering every coverable element."""
    matrix = np.asarray(matrix, dtype=bool)
    coverable = matrix.any(axis=1)
    uncovered = coverable.copy()
    chosen = []
    while uncovered.any():
        gains = matrix[uncovered].sum(axis=0)
        best = int(np.argmax(gains))
        if gains[best] == 0:
            break
        chosen.append(best)
        uncovered &= ~matrix[:, best]
    return chosen


def determine_minimum_overlapping_images(
    mesh_file: PATH_TYPE,
    cameras_file: PATH_TYPE,
    image_folder: PATH_TYPE,
    mesh_CRS: typing.Optional[int] = None,
    original_image_folder: typing.Optional[PATH_TYPE] = None,
    take_every_nth_camera: int = 1,
    aggregate_image_scale: float = 0.05,
    mesh_downsample: float = 1.0,
    min_observations: int = 1,
    selected_images_savefolder: typing.Optional[PATH_TYPE] = None,
    selected_images_mask_savefile: typing.Optional[PATH_TYPE] = None,
) -> typing.List[int]:
    """Select the minimum image set seeing every visible face (reference
    annotation_image_selection.py:17-202).

    Returns the chosen camera indices.
    """
    camera_set = MetashapeCameraSet(
        cameras_file,
        image_folder,
        original_image_folder=original_image_folder,
        validate_images=False,
    )
    if take_every_nth_camera > 1:
        camera_set = camera_set.get_subset_every_nth(take_every_nth_camera)
    mesh = TexturedMesh(
        mesh_file,
        downsample_target=mesh_downsample,
        CRS=mesh_CRS,
        transform_filename=cameras_file,
    )
    sensor = camera_set.sensors[camera_set.sensor_IDs[0]]
    segmentor = ImageIDSegmentor(
        image_shape=(sensor["image_height"], sensor["image_width"]),
        num_images=len(camera_set),
    )
    seg_cameras = SegmentorCameraSet(camera_set, segmentor)
    # faces x images visibility counts (reference :100-117)
    counts, _ = aggregate_index_predictions(
        mesh,
        seg_cameras,
        n_classes=len(camera_set),
        aggregate_img_scale=aggregate_image_scale,
        check_null_image=False,
    )
    visibility = (counts >= min_observations).toarray()
    chosen = greedy_set_cover(visibility)

    if selected_images_mask_savefile is not None:
        mask = np.zeros(len(camera_set), dtype=bool)
        mask[chosen] = True
        np.save(selected_images_mask_savefile, mask)
    if selected_images_savefolder is not None:
        ensure_folder(selected_images_savefolder)
        for i in chosen:
            src = camera_set.get_image_filename(i)
            if src is not None and src.exists():
                shutil.copy(src, selected_images_savefolder)
    return chosen


def parse_args():
    parser = argparse.ArgumentParser(
        description=determine_minimum_overlapping_images.__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--mesh-file", required=True)
    parser.add_argument("--cameras-file", required=True)
    parser.add_argument("--image-folder", required=True)
    parser.add_argument("--mesh-CRS", type=int, default=None)
    parser.add_argument("--take-every-nth-camera", type=int, default=1)
    parser.add_argument("--aggregate-image-scale", type=float, default=0.05)
    parser.add_argument("--mesh-downsample", type=float, default=1.0)
    parser.add_argument("--min-observations", type=int, default=1)
    parser.add_argument("--selected-images-savefolder", default=None)
    parser.add_argument("--selected-images-mask-savefile", default=None)
    parser.add_argument("--original-image-folder", default=None)
    return parser.parse_args()


if __name__ == "__main__":
    determine_minimum_overlapping_images(**vars(parse_args()))
