"""Camera core tests: projection geometry, batching, Metashape parsing."""

import textwrap

import numpy as np
import pytest

from geograypher_tpu.cameras import (
    CameraSet,
    MetashapeCameraSet,
    make_camera_batch,
    pixel_rays,
    project_points,
)


def nadir_camera_transform(height: float) -> np.ndarray:
    """Camera at (0, 0, height) looking straight down (+Z cam = -Z world),
    image up = -Y cam = +Y world (geometry of reference test_utils.py:42-67,
    re-derived)."""
    return np.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, height],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def test_project_points_nadir():
    f, w, h = 100.0, 200, 200
    batch = make_camera_batch(nadir_camera_transform(2.0), f, 0.0, 0.0, w, h)
    # World origin is on the optical axis -> image center
    pts = np.array([[0.0, 0.0, 0.0]])
    xy, depth, valid = project_points(batch, pts)
    assert np.allclose(np.asarray(xy)[0, 0], [100.0, 100.0])
    assert np.allclose(np.asarray(depth)[0, 0], 2.0)
    assert np.asarray(valid)[0, 0]

    # World +X maps to +col; world +Y maps to -row (image up is +Y world)
    pts = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    xy, _, valid = project_points(batch, pts)
    xy = np.asarray(xy)[0]
    assert np.allclose(xy[0], [150.0, 100.0])  # x=1 at depth 2, f=100 -> +50 col
    assert np.allclose(xy[1], [100.0, 50.0])  # y=1 -> -50 rows
    assert np.asarray(valid)[0].all()

    # Behind the camera -> invalid
    pts = np.array([[0.0, 0.0, 5.0]])
    _, _, valid = project_points(batch, pts)
    assert not np.asarray(valid)[0, 0]


def test_principal_point_offset():
    f, w, h = 100.0, 200, 200
    batch = make_camera_batch(nadir_camera_transform(2.0), f, 5.0, -3.0, w, h)
    xy, _, _ = project_points(batch, np.array([[0.0, 0.0, 0.0]]))
    assert np.allclose(np.asarray(xy)[0, 0], [105.0, 97.0])
    # ideal projection ignores the principal point (rasterizer convention)
    xy, _, _ = project_points(
        batch, np.array([[0.0, 0.0, 0.0]]), use_principal_point=False
    )
    assert np.allclose(np.asarray(xy)[0, 0], [100.0, 100.0])


def test_pixel_rays_roundtrip():
    """cast a ray through a pixel, project the endpoint back -> same pixel"""
    f, w, h = 120.0, 320, 240
    c2w = nadir_camera_transform(3.0)
    batch = make_camera_batch(c2w, f, 2.0, -1.0, w, h)
    pix_ij = np.array([[[30.0, 50.0], [120.0, 300.0], [200.0, 10.0]]])
    starts, ends = pixel_rays(batch, pix_ij, line_length=5.0)
    starts, ends = np.asarray(starts), np.asarray(ends)
    assert np.allclose(starts[0], [0.0, 0.0, 3.0], atol=1e-5)
    assert np.allclose(
        np.linalg.norm(ends[0] - starts[0], axis=-1), 5.0, atol=1e-4
    )
    xy, _, _ = project_points(batch, ends[0])
    xy = np.asarray(xy)[0]
    # (row, col) -> (col, row)
    assert np.allclose(xy, pix_ij[0][:, ::-1], atol=1e-3)


def test_batch_scaling():
    batch = make_camera_batch(nadir_camera_transform(2.0), 100.0, 4.0, 2.0, 200, 100)
    half = batch.scaled(0.5)
    assert half.image_width == 100 and half.image_height == 50
    assert np.isclose(float(half.f[0]), 50.0)
    assert np.isclose(float(half.cx[0]), 2.0)


def make_metashape_xml(tmp_path, n_cameras=3, with_component=True):
    """Synthesize a minimal Metashape camera XML in the reference's schema
    (derived from the format description, reference derived_cameras.py:44+)."""
    transforms = []
    for i in range(n_cameras):
        t = np.eye(4)
        t[:3, 3] = [i * 2.0, 1.0, 30.0]
        transforms.append(" ".join(str(v) for v in t.flatten()))
    cams = "\n".join(
        f'<camera id="{i}" sensor_id="0" label="images/img_{i:04d}.JPG">'
        f"<transform>{tr}</transform></camera>"
        for i, tr in enumerate(transforms)
    )
    # one unaligned camera (no transform) that must be skipped
    cams += f'\n<camera id="{n_cameras}" sensor_id="0" label="images/bad.JPG"></camera>'
    component = (
        """
        <components next_id="1" active_id="0">
          <component id="0" label="Component 1">
            <transform>
              <rotation locked="true">1 0 0 0 1 0 0 0 1</rotation>
              <translation locked="true">-2449000 -4774000 3580000</translation>
              <scale locked="true">1.2</scale>
            </transform>
          </component>
        </components>"""
        if with_component
        else ""
    )
    xml = textwrap.dedent(
        f"""\
        <document version="2.0.0">
          <chunk label="Chunk 1" enabled="true">
            <sensors next_id="1">
              <sensor id="0" label="FC330" type="frame">
                <resolution width="400" height="300"/>
                <calibration type="frame" class="adjusted">
                  <resolution width="400" height="300"/>
                  <f>350.5</f>
                  <cx>1.25</cx>
                  <cy>-0.75</cy>
                  <k1>-0.01</k1>
                  <k2>0.002</k2>
                  <p1>0.0001</p1>
                </calibration>
              </sensor>
            </sensors>
            <cameras next_id="{n_cameras + 1}" next_group_id="0">
              {cams}
            </cameras>
            {component}
          </chunk>
        </document>"""
    )
    path = tmp_path / "cameras.xml"
    path.write_text(xml)
    return path


def test_metashape_parse(tmp_path):
    path = make_metashape_xml(tmp_path)
    cams = MetashapeCameraSet(path, image_folder=tmp_path / "imgs")
    # unaligned camera dropped
    assert len(cams) == 3
    sensor = cams.sensors[0]
    assert sensor["f"] == 350.5
    assert sensor["cx"] == 1.25
    assert sensor["distortion_params"]["k1"] == -0.01
    assert "p1" in sensor["distortion_params"]
    # chunk->ECEF transform parsed with scale folded into rotation block
    t = cams.get_local_to_epsg_4978_transform()
    assert t is not None
    assert np.allclose(t[:3, :3], np.eye(3) * 1.2)
    # lon/lats derived from optimized poses: all cameras near each other
    lls = cams.get_lon_lat_coords()
    assert len(lls) == 3
    lons = [ll[0] for ll in lls]
    lats = [ll[1] for ll in lls]
    assert np.ptp(lons) < 0.1 and np.ptp(lats) < 0.1

    batch = cams.get_camera_batch()
    assert batch.n_cameras == 3
    assert batch.image_width == 400

    # subsetting
    sub = cams.get_subset_by_regex(r"img_000[01]")
    assert len(sub) == 2


def test_metashape_no_component(tmp_path):
    path = make_metashape_xml(tmp_path, with_component=False)
    cams = MetashapeCameraSet(path, image_folder=tmp_path / "imgs")
    assert cams.get_local_to_epsg_4978_transform() is None
    assert len(cams) == 3


def test_camera_set_subset_and_hash(tmp_path):
    path = make_metashape_xml(tmp_path)
    cams = MetashapeCameraSet(path, image_folder=tmp_path / "imgs")
    sub = cams[0:2]
    assert len(sub) == 2
    h1 = cams.get_camera_hash()
    h2 = sub.get_camera_hash()
    assert h1 != h2
    assert cams.get_camera_hash() == h1  # stable
    # distortion params are part of the hash (they key the pix2face cache)
    import copy

    cams2 = MetashapeCameraSet(path, image_folder=tmp_path / "imgs")
    cams2.sensors = copy.deepcopy(cams2.sensors)
    sid = cams2.sensor_IDs[0]
    cams2.sensors[sid]["distortion_params"]["k1"] = 0.123
    assert cams2.get_camera_hash() != h1


def make_colmap_files(tmp_path):
    cameras_txt = tmp_path / "cameras.txt"
    cameras_txt.write_text(
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
        "# Number of cameras: 1\n"
        "1 SIMPLE_RADIAL 640 480 500.0 320.0 240.0 -0.05\n"
    )
    images_txt = tmp_path / "images.txt"
    # identity rotation quaternion, camera at origin; every other line is
    # keypoints (skipped by the parser)
    images_txt.write_text(
        "# Image list with two lines of data per image:\n"
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n"
        "# Number of images: 2\n"
        "1 1.0 0.0 0.0 0.0 0.0 0.0 -5.0 1 img_a.jpg\n"
        "100 200 -1\n"
        "2 0.7071068 0.0 0.7071068 0.0 1.0 0.0 -5.0 1 img_b.jpg\n"
        "\n"
    )
    return cameras_txt, images_txt


def test_colmap_parse(tmp_path):
    from geograypher_tpu.cameras.colmap import COLMAPCameraSet

    cameras_txt, images_txt = make_colmap_files(tmp_path)
    cams = COLMAPCameraSet(cameras_txt, images_txt, image_folder=tmp_path)
    assert len(cams) == 2
    sensor = cams.sensors[1]
    assert sensor["f"] == 500.0
    # cx/cy re-centered from corner-origin convention
    assert sensor["cx"] == 0.0 and sensor["cy"] == 0.0
    assert sensor["distortion_params"]["k1"] == -0.05
    # identity world_to_cam with t=(0,0,-5) -> camera center at +5 z
    c2w = cams.cam_to_world_transforms[0]
    assert np.allclose(c2w[:3, 3], [0, 0, 5], atol=1e-6)
    assert np.allclose(c2w[:3, :3], np.eye(3), atol=1e-6)
    # quaternion (w=x=0.707...) is a 90-degree rotation about y
    c2w2 = cams.cam_to_world_transforms[1]
    assert not np.allclose(c2w2[:3, :3], np.eye(3))
    assert np.isclose(abs(np.linalg.det(c2w2[:3, :3])), 1.0, atol=1e-6)

    batch = cams.get_camera_batch()
    assert batch.image_width == 640


def test_colmap_unsupported_model(tmp_path):
    from geograypher_tpu.cameras.colmap import COLMAPCameraSet

    cameras_txt, images_txt = make_colmap_files(tmp_path)
    cameras_txt.write_text(
        "#\n#\n#\n1 OPENCV 640 480 500.0 320.0 240.0 -0.05\n"
    )
    with pytest.raises(NotImplementedError):
        COLMAPCameraSet(cameras_txt, images_txt, image_folder=tmp_path)


def test_export_images(tmp_path):
    from geograypher_tpu.cameras.core import CameraSet

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jpg").write_bytes(b"x")
    cams = CameraSet(
        [np.eye(4)],
        {0: {"f": 10.0, "cx": 0, "cy": 0, "image_width": 4, "image_height": 4}},
        image_filenames=[src / "a.jpg"],
    )
    out = tmp_path / "out"
    cams.export_images(out, copy=True)
    assert (out / "a.jpg").read_bytes() == b"x"


def test_rig_cameras_from_equirectangular(tmp_path):
    from geograypher_tpu.cameras.rig import (
        create_rig_cameras_from_equirectangular,
    )

    path = make_metashape_xml(tmp_path)
    rig_camera = {
        "f": 100.0, "cx": 0.0, "cy": 0.0,
        "image_width": 200, "image_height": 200,
    }
    orientations = [
        {"roll_deg": 0.0, "pitch_deg": 0.0, "yaw_deg": y}
        for y in (0.0, 90.0, 180.0, 270.0)
    ]
    rig = create_rig_cameras_from_equirectangular(
        camera_file=path,
        original_images="images",
        perspective_images=tmp_path / "persp",
        rig_camera=rig_camera,
        rig_orientations=orientations,
        perspective_filename_format_str="_yaw{yaw_deg:.0f}",
    )
    # 3 aligned base cameras x 4 rig members
    assert len(rig) == 12
    names = [f.name for f in rig.image_filenames[:4]]
    assert names == [
        "img_0000_yaw0.png", "img_0000_yaw90.png",
        "img_0000_yaw180.png", "img_0000_yaw270.png",
    ]
    # yaw=0 member keeps the base orientation; yaw=180 flips the view axis
    r0 = rig.cam_to_world_transforms[0][:3, :3]
    r180 = rig.cam_to_world_transforms[2][:3, :3]
    z0 = r0 @ np.array([0, 0, 1.0])
    z180 = r180 @ np.array([0, 0, 1.0])
    assert np.allclose(z0, -z180, atol=1e-9)
    # all members share the camera center
    assert np.allclose(
        rig.cam_to_world_transforms[0][:3, 3],
        rig.cam_to_world_transforms[3][:3, 3],
    )
    # batch construction works with the synthetic sensor
    batch = rig.get_camera_batch()
    assert batch.n_cameras == 12 and batch.image_width == 200


def _enu_to_ecef_transform(lat_deg, lon_deg, alt=0.0):
    from geograypher_tpu.utils import crs

    lat, lon = np.deg2rad(lat_deg), np.deg2rad(lon_deg)
    e = np.array([-np.sin(lon), np.cos(lon), 0.0])
    n = np.array(
        [-np.sin(lat) * np.cos(lon), -np.sin(lat) * np.sin(lon), np.cos(lat)]
    )
    u = np.array(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
    )
    x, y, z = crs.lla_to_ecef(lat_deg, lon_deg, alt)
    t = np.eye(4)
    t[:3, :3] = np.stack([e, n, u], axis=1)
    t[:3, 3] = [x, y, z]
    return t


def test_camera_view_angles_recover_constructed_tilt():
    """Off-nadir pitch/yaw (reference cameras.py:244-326): cameras built
    with known tilts in a local ENU frame must report those tilts."""
    from geograypher_tpu.cameras.core import CameraSet

    def rx(a):
        a = np.deg2rad(a)
        return np.array(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
        )

    def ry(a):
        a = np.deg2rad(a)
        return np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )

    nadir = np.diag([1.0, -1.0, -1.0])  # cam x=east, y=south, z=down (ENU)
    cases = [(0.0, 0.0), (10.0, 0.0), (0.0, 25.0), (7.0, 3.0)]
    c2ws = []
    for pitch, yaw in cases:
        c2w = np.eye(4)
        c2w[:3, :3] = nadir @ ry(yaw) @ rx(pitch)
        c2w[2, 3] = 100.0
        c2ws.append(c2w)
    cams = CameraSet(
        c2ws,
        {0: {"f": 100.0, "cx": 0.0, "cy": 0.0,
             "image_width": 100, "image_height": 100}},
        local_to_epsg_4978_transform=_enu_to_ecef_transform(40.0, -120.0),
    )
    angles = cams.get_camera_view_angles()
    for (pitch, yaw), (got_p, got_y) in zip(cases, angles):
        assert abs(got_p - pitch) < 0.05, (pitch, yaw, got_p, got_y)
        assert abs(got_y - yaw) < 0.05, (pitch, yaw, got_p, got_y)


def test_image_cache_one_read_per_file(tmp_path, monkeypatch):
    """Aggregation loops must pay one disk read per image
    (reference cameras.py:154-177 caching)."""
    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.utils import io as io_utils

    img_file = tmp_path / "view.npy"
    np.save(img_file, np.zeros((8, 8, 3), np.float32))
    reads = []
    orig = io_utils.read_image_or_numpy

    def counting(fname):
        reads.append(str(fname))
        return orig(fname)

    monkeypatch.setattr(io_utils, "read_image_or_numpy", counting)
    cams = CameraSet(
        [np.eye(4)] * 2,
        {0: {"f": 10.0, "cx": 0.0, "cy": 0.0,
             "image_width": 8, "image_height": 8}},
        image_filenames=[img_file, img_file],
    )
    for _ in range(3):
        cams.get_image_by_index(0)
        cams.get_image_by_index(1, image_scale=0.5)
    assert len(reads) == 1


def test_scaled_batch_scales_affinity_terms():
    """b1/b2 are pixel units like f/cx/cy and must scale with the image;
    radial/tangential coefficients are normalized-coordinate and must
    not (review regression)."""
    import numpy as np

    from geograypher_tpu.cameras.core import CameraSet

    dist = {"k1": -0.1, "k2": 0.01, "p1": 0.001, "p2": -0.002,
            "b1": 2.0, "b2": -1.0}
    cams = CameraSet(
        [np.eye(4)],
        {0: {"f": 100.0, "cx": 3.0, "cy": -2.0, "image_width": 200,
             "image_height": 100, "distortion_params": dist}},
    )
    batch = cams.get_camera_batch(image_scale=0.5)
    d = np.asarray(batch.distortion[0])
    assert np.isclose(d[0], -0.1) and np.isclose(d[4], 0.001)
    assert np.isclose(d[6], 1.0) and np.isclose(d[7], -0.5)
    assert np.isclose(float(batch.f[0]), 50.0)


def test_ray_length_limit_without_boundaries():
    """limit_ray_length applies even with no covering-mesh boundaries
    (review regression: the filter was nested under the clip branch)."""
    import numpy as np

    from geograypher_tpu.cameras.core import CameraSet

    class OneDet:
        def get_detection_centers(self, filename):
            return np.array([[40.0, 40.0]])

    c2w = np.eye(4)
    cams = CameraSet(
        [c2w],
        {0: {"f": 40.0, "cx": 0.0, "cy": 0.0, "image_width": 80,
             "image_height": 80}},
    )
    data = cams.calc_line_segments(
        OneDet(), ray_length_local=100.0, boundaries=None,
        limit_ray_length_local=10.0,
    )
    assert data["ray_starts"].shape[0] == 0  # 100-unit ray filtered
    data2 = cams.calc_line_segments(
        OneDet(), ray_length_local=100.0, boundaries=None,
        limit_ray_length_local=200.0,
    )
    assert data2["ray_starts"].shape[0] == 1
