"""project_detections: per-image detection boxes -> per-face instance
projections -> geospatial polygons (port of
/root/reference/geograypher/entrypoints/project_detections.py:21-230)."""

from __future__ import annotations

import argparse
import typing

import scipy.sparse

from geograypher_tpu.cameras.metashape import MetashapeCameraSet
from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.meshes.sparse import (
    aggregate_index_predictions,
    sparse_argmax,
)
from geograypher_tpu.predictors.segmentors import TabularRectangleSegmentor
from geograypher_tpu.utils.files import ensure_containing_folder


def project_detections(
    mesh_file: PATH_TYPE,
    cameras_file: PATH_TYPE,
    image_folder: PATH_TYPE,
    detections_folder: PATH_TYPE,
    mesh_CRS: typing.Optional[int] = None,
    original_image_folder: typing.Optional[PATH_TYPE] = None,
    project_to_mesh: bool = True,
    projections_to_mesh_savefile: typing.Optional[PATH_TYPE] = None,
    convert_to_geospatial: bool = True,
    projections_to_geospatial_savefile: typing.Optional[PATH_TYPE] = None,
    default_focal_length_pixels: typing.Optional[float] = None,
    image_shape: typing.Tuple[int, int] = (4008, 6016),
    aggregate_image_scale: float = 0.25,
    mesh_downsample: float = 1.0,
    vis_mesh: bool = False,
):
    """Project tabular detections onto the mesh as sparse per-face instance
    counts, then export per-detection polygons (reference
    project_detections.py:21-191)."""
    sensor_defaults = {"cx": 0.0, "cy": 0.0}
    if default_focal_length_pixels is not None:
        # reference project_detections.py forwards this as a sensor
        # default for cameras files lacking calibration
        sensor_defaults["f"] = float(default_focal_length_pixels)
    camera_set = MetashapeCameraSet(
        cameras_file,
        image_folder,
        original_image_folder=original_image_folder,
        validate_images=False,
        default_sensor_params=sensor_defaults,
    )
    mesh = TexturedMesh(
        mesh_file,
        downsample_target=mesh_downsample,
        CRS=mesh_CRS,
        transform_filename=cameras_file,
    )
    detector = TabularRectangleSegmentor(
        detections_folder, image_folder, image_shape=image_shape
    )
    seg_cameras = SegmentorCameraSet(camera_set, detector)

    counts = None
    if project_to_mesh:
        counts, faces_seen = aggregate_index_predictions(
            mesh,
            seg_cameras,
            n_classes=detector.num_classes,
            aggregate_img_scale=aggregate_image_scale,
        )
        if projections_to_mesh_savefile is not None:
            ensure_containing_folder(projections_to_mesh_savefile)
            scipy.sparse.save_npz(
                projections_to_mesh_savefile, counts.tocoo().tocsr()
            )

    if convert_to_geospatial and counts is not None:
        face_det = sparse_argmax(counts)
        vd = mesh.export_face_labels_vector(face_det)
        # merge detection metadata by detection index
        det_meta = detector.df
        names = []
        for cid in vd["class_ID"]:
            if 0 <= cid < len(det_meta):
                names.append(str(det_meta.iloc[int(cid)].get("label", cid)))
            else:
                names.append(str(cid))
        vd.attributes["detection_label"] = names
        if projections_to_geospatial_savefile is not None:
            vd.to_file(projections_to_geospatial_savefile)
        return counts, vd
    return counts, None


def parse_args():
    parser = argparse.ArgumentParser(
        description=project_detections.__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--mesh-file", required=True)
    parser.add_argument("--cameras-file", required=True)
    parser.add_argument("--image-folder", required=True)
    parser.add_argument("--detections-folder", required=True)
    parser.add_argument("--mesh-CRS", type=int, default=None)
    parser.add_argument("--projections-to-mesh-savefile", default=None)
    parser.add_argument("--projections-to-geospatial-savefile", default=None)
    parser.add_argument("--aggregate-image-scale", type=float, default=0.25)
    parser.add_argument("--mesh-downsample", type=float, default=1.0)
    return parser.parse_args()


if __name__ == "__main__":
    project_detections(**vars(parse_args()))
