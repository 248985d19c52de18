"""End-to-end under-canopy rig workflow (BASELINE config #5).

Mirrors /root/reference/examples/undercanopy_painting.ipynb on the
synthetic 360 survey: equirectangular stations -> perspective rig fan-out
(``create_rig_cameras_from_equirectangular``) -> LookUpSegmentor
predictions -> occlusion-aware aggregation -> per-face labels recovered
against ground truth.
"""

import numpy as np
import pytest

from geograypher_tpu.cameras.rig import create_rig_cameras_from_equirectangular
from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.ops.rasterize import RasterConfig
from geograypher_tpu.predictors.segmentors import LookUpSegmentor
from geograypher_tpu.utils.example_data import create_undercanopy_survey
from geograypher_tpu.utils.indexing import find_argmax_nonzero_value


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    return create_undercanopy_survey(
        tmp_path_factory.mktemp("uc"), n_stations=2, sensor=96
    )


@pytest.fixture(scope="module")
def rig_set(survey):
    return create_rig_cameras_from_equirectangular(
        camera_file=survey["cameras_file"],
        original_images=survey["equirect_folder"],
        perspective_images=survey["prediction_folder"],
        rig_camera=survey["rig_camera"],
        rig_orientations=survey["rig_orientations"],
        perspective_filename_format_str=survey["format_str"],
    )


def test_rig_fanout_structure(survey, rig_set):
    n_members = len(survey["rig_orientations"])
    assert len(rig_set) == 2 * n_members
    # every member sits exactly at its station (pure rotation rig)
    t = np.asarray(rig_set.cam_to_world_transforms)
    for s in range(2):
        block = t[s * n_members:(s + 1) * n_members, :3, 3]
        assert np.allclose(block, block[0])
    # member filenames follow the format string against the station stem
    names = [f.name for f in rig_set.image_filenames[:n_members]]
    assert names[0] == "pano_0000_yaw000_pitch000.png"
    assert "pano_0000_yaw000_pitch-90.png" in names


def test_rig_aggregation_recovers_labels(survey, rig_set):
    """The flagship check: occlusion-aware aggregation through the rig
    recovers the known per-face labels on every observed face."""
    mesh = TexturedMesh(
        survey["mesh_file"],
        transform_filename=survey["cameras_file"],
        raster_config=RasterConfig(caps=(1024, 128, 64, 32)),
    )
    seg_set = SegmentorCameraSet(
        rig_set,
        LookUpSegmentor(
            base_folder=survey["prediction_folder"],
            lookup_folder=survey["prediction_folder"],
            num_classes=survey["n_classes"],
        ),
    )
    averaged, _ = mesh.aggregate_projected_images(seg_set)
    face_classes = find_argmax_nonzero_value(averaged)
    truth = survey["face_labels"].astype(float)
    seen = np.isfinite(face_classes)
    # ground-level 360 stations see most of the small scene
    assert seen.sum() > 0.5 * len(truth)
    acc = float(np.mean(face_classes[seen] == truth[seen]))
    assert acc == pytest.approx(1.0)
    # canopy objects (non-ground classes) were actually observed
    observed_classes = set(np.unique(face_classes[seen]).astype(int))
    assert len(observed_classes & set(range(1, survey["n_classes"]))) >= 2
