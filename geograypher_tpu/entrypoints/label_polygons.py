"""label_polygons: assign classes to geospatial polygons from aggregated
per-face values (port of
/root/reference/geograypher/entrypoints/label_polygons.py:13-152)."""

from __future__ import annotations

import argparse
import typing

import numpy as np

from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.utils.vector import VectorData


def label_polygons(
    mesh_file: PATH_TYPE,
    mesh_CRS: typing.Optional[int],
    aggregated_face_values_file: PATH_TYPE,
    geospatial_polygons_to_label: PATH_TYPE,
    geospatial_polygons_labeled_savefile: PATH_TYPE,
    transform_filename: typing.Optional[PATH_TYPE] = None,
    DTM_file: typing.Optional[PATH_TYPE] = None,
    height_above_ground_threshold: float = 2.0,
    ground_voting_weight: float = 0.01,
    ROI: typing.Optional[PATH_TYPE] = None,
    ROI_buffer_radius_meters: float = 50,
    IDs_to_labels: typing.Optional[dict] = None,
    mesh_downsample: float = 1.0,
    n_polygons_per_cluster: int = 1000,
    vis_mesh: bool = False,
):
    """Label polygons by area-weighted vote over aggregated face values,
    down-weighting ground faces (reference label_polygons.py:38-116)."""
    mesh = TexturedMesh(
        mesh_file,
        downsample_target=mesh_downsample,
        CRS=mesh_CRS,
        transform_filename=transform_filename,
        ROI=ROI,
        ROI_buffer_meters=ROI_buffer_radius_meters,
        IDs_to_labels=IDs_to_labels,
    )
    aggregated = np.load(aggregated_face_values_file)
    if aggregated.ndim == 2:
        from geograypher_tpu.ops.aggregate import find_argmax_nonzero_value

        import jax.numpy as jnp

        face_labels = np.asarray(
            find_argmax_nonzero_value(
                jnp.asarray(np.nan_to_num(aggregated), jnp.float32)
            )
        )
        face_labels[~np.isfinite(aggregated).any(axis=1)] = np.nan
    else:
        face_labels = aggregated

    face_weighting = None
    if DTM_file is not None:
        # down-weight ground faces in the vote (label_polygons.py:88-98)
        ground_verts = mesh.get_height_above_ground(
            DTM_file, threshold=height_above_ground_threshold
        )
        from geograypher_tpu.ops.aggregate import vert_to_face_mean

        import jax.numpy as jnp

        ground_face = np.asarray(
            vert_to_face_mean(
                jnp.asarray(mesh.faces),
                jnp.asarray(ground_verts.astype(np.float32)),
            )
        )[:, 0]
        face_weighting = np.where(ground_face > 0.5, ground_voting_weight, 1.0)

    polygons = VectorData.read_file(geospatial_polygons_to_label)
    from geograypher_tpu.meshes.chunked import label_polygons_chunked

    labels = label_polygons_chunked(
        mesh,
        face_labels,
        polygons,
        polygons_per_cluster=n_polygons_per_cluster,
        face_weighting=face_weighting,
    )
    polygons.attributes["predicted_labels"] = labels
    polygons.to_file(geospatial_polygons_labeled_savefile)
    return labels


def parse_args():
    parser = argparse.ArgumentParser(
        description=label_polygons.__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--mesh-file", required=True)
    parser.add_argument("--mesh-CRS", type=int, default=None)
    parser.add_argument("--aggregated-face-values-file", required=True)
    parser.add_argument("--geospatial-polygons-to-label", required=True)
    parser.add_argument("--geospatial-polygons-labeled-savefile", required=True)
    parser.add_argument("--transform-filename", default=None)
    parser.add_argument("--DTM-file", default=None)
    parser.add_argument("--height-above-ground-threshold", type=float, default=2.0)
    parser.add_argument("--ground-voting-weight", type=float, default=0.01)
    parser.add_argument("--ROI", default=None)
    parser.add_argument("--ROI-buffer-radius-meters", type=float, default=50)
    parser.add_argument("--mesh-downsample", type=float, default=1.0)
    parser.add_argument("--n-polygons-per-cluster", type=int, default=1000)
    return parser.parse_args()


if __name__ == "__main__":
    label_polygons(**vars(parse_args()))
