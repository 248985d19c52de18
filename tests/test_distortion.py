"""Distortion engine: forward model parity properties, Newton inverse
roundtrips, map/warp semantics (modeled on the reference's property-based
distortion tests, tests/test_derived_cameras.py:138-415)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geograypher_tpu.cameras.distortion import (
    DistortionEngine,
    ideal_to_warped_pixels,
    make_maps,
    remap_image,
    remap_image_jax,
    warped_to_ideal_pixels,
)

W, H, F = 400, 300, 350.0


def dvec(**kw):
    order = ("k1", "k2", "k3", "k4", "p1", "p2", "b1", "b2")
    return jnp.asarray([kw.get(k, 0.0) for k in order], jnp.float32)


def test_zero_distortion_identity():
    xs = jnp.asarray([0.0, 100.0, 399.0])
    ys = jnp.asarray([0.0, 150.0, 299.0])
    wx, wy = ideal_to_warped_pixels(xs, ys, F, 0.0, 0.0, W, H, dvec())
    assert np.allclose(wx, xs, atol=1e-4)
    assert np.allclose(wy, ys, atol=1e-4)


def test_principal_point_shift():
    wx, wy = ideal_to_warped_pixels(
        jnp.asarray([200.0]), jnp.asarray([150.0]), F, 5.0, -3.0, W, H, dvec()
    )
    # image center maps to center + (cx, cy)
    assert np.isclose(float(wx[0]), 205.0, atol=1e-4)
    assert np.isclose(float(wy[0]), 147.0, atol=1e-4)


@pytest.mark.parametrize("k1,outward", [(0.1, True), (-0.1, False)])
def test_radial_direction(k1, outward):
    """Positive k1 (barrel->pincushion in this convention) pushes
    off-center pixels OUTWARD in the warped image; negative pulls inward."""
    d = dvec(k1=k1)
    wx, _ = ideal_to_warped_pixels(
        jnp.asarray([300.0]), jnp.asarray([150.0]), F, 0.0, 0.0, W, H, d
    )
    moved_out = float(wx[0]) > 300.0
    assert moved_out == outward


def test_newton_inverse_roundtrip():
    rng = np.random.default_rng(0)
    d = dvec(k1=-0.12, k2=0.03, k3=-0.005, p1=0.001, p2=-0.0015, b1=0.5, b2=-0.3)
    xs = jnp.asarray(rng.uniform(20, W - 20, 500), jnp.float32)
    ys = jnp.asarray(rng.uniform(20, H - 20, 500), jnp.float32)
    wx, wy = ideal_to_warped_pixels(xs, ys, F, 2.0, -1.0, W, H, d)
    ix, iy = warped_to_ideal_pixels(wx, wy, F, 2.0, -1.0, W, H, d)
    assert np.allclose(ix, xs, atol=2e-2)
    assert np.allclose(iy, ys, atol=2e-2)


def test_maps_shapes_and_scale():
    d = dvec(k1=-0.05)
    i2w, w2i = make_maps(F, 0.0, 0.0, W, H, d, image_scale=1.0)
    assert i2w.shape == (2, H, W) and w2i.shape == (2, H, W)
    i2w_s, _ = make_maps(F, 0.0, 0.0, W, H, d, image_scale=0.5)
    assert i2w_s.shape == (2, H // 2, W // 2)
    # scaled map ~ full map subsampled and halved
    full = np.asarray(i2w)
    half = np.asarray(i2w_s)
    assert np.allclose(half[:, 10, 20] * 2, full[:, 20, 40] + 0.5, atol=1.0)


def test_warp_dewarp_image_roundtrip():
    """Undistorting then re-distorting a smooth image approximately
    recovers it away from the boundary."""
    eng = DistortionEngine()
    d = np.array([-0.08, 0.01, 0, 0, 0, 0, 0, 0], np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    img = (np.sin(xx / 23.0) + np.cos(yy / 31.0)).astype(np.float32)
    ideal = eng.warp_dewarp_image(
        img, F, 0, 0, W, H, d, warped_to_ideal=True, interpolation_order=1
    )
    back = eng.warp_dewarp_image(
        ideal, F, 0, 0, W, H, d, warped_to_ideal=False, interpolation_order=1
    )
    inner = (slice(40, H - 40), slice(40, W - 40))
    assert np.abs(back[inner] - img[inner]).mean() < 0.02


def test_discrete_mask_survives_nn_warp():
    """Class ids survive a nearest-neighbor warp without new values
    (reference test_derived_cameras.py:188-211)."""
    eng = DistortionEngine()
    d = np.array([-0.1, 0, 0, 0, 0, 0, 0, 0], np.float32)
    mask = np.zeros((H, W), np.int32)
    mask[50:100, 80:160] = 3
    mask[150:220, 200:300] = 7
    out = eng.warp_dewarp_image(
        mask, F, 0, 0, W, H, d,
        warped_to_ideal=False, fill_value=-1, interpolation_order=0,
    )
    assert set(np.unique(out)).issubset({-1, 0, 3, 7})
    assert (out == 3).any() and (out == 7).any()


def test_warped_pix2face_corners_invalid():
    """With barrel distortion, warping an all-valid ideal pix2face to the
    real (warped) image leaves the corners unmapped (-1), while the center
    stays valid (reference test_derived_cameras.py:339-415)."""
    eng = DistortionEngine()
    d = np.array([-0.08, 0, 0, 0, 0, 0, 0, 0], np.float32)
    p2f = np.arange(H * W, dtype=np.int32).reshape(H, W)
    warped = eng.warp_dewarp_image(
        p2f, F, 0, 0, W, H, d,
        warped_to_ideal=False, fill_value=-1, interpolation_order=0,
    )
    assert warped[0, 0] == -1 and warped[-1, -1] == -1
    assert warped[H // 2, W // 2] != -1


def test_remap_jax_matches_cv2_nn():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 50, (64, 96)).astype(np.int32)
    ijmap = np.stack(
        [
            rng.uniform(-5, 69, (64, 96)).astype(np.float32),
            rng.uniform(-5, 101, (64, 96)).astype(np.float32),
        ]
    )
    a = remap_image(img, ijmap, fill_value=-1, interpolation_order=0)
    b = np.asarray(
        remap_image_jax(jnp.asarray(img), jnp.asarray(ijmap), fill_value=-1)
    )
    # cv2 and jnp.round may differ on exact .5 boundaries; random reals won't
    assert (a == b).mean() > 0.999


def test_distortion_auto_applied_end_to_end():
    """Production-path parity with k1 != 0 (reference meshes.py:1805-1821):
    a calibrated sensor's distortion map is applied by DEFAULT in
    render_flat -> segment -> aggregate, and the round trip recovers the
    per-face labels exactly on observed faces — on both the single-device
    and the distributed (shard_map) paths."""
    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.ops.rasterize import RasterConfig
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )
    from geograypher_tpu.predictors.segmentors import ArraySegmentor
    from geograypher_tpu.utils.fixtures import make_grid_mesh, nadir_camera

    cfg = RasterConfig(caps=(256, 64, 32, 16))
    rng = np.random.default_rng(7)
    verts, faces = make_grid_mesh(n=13, size=4.0)
    mesh = TexturedMesh((verts, faces), raster_config=cfg)
    labels = rng.integers(0, 3, mesh.n_faces).astype(float)
    mesh.set_texture(labels, is_vertex=False)

    sensor = {
        "f": 40.0, "cx": 0.0, "cy": 0.0,
        "image_width": 80, "image_height": 80,
        "distortion_params": {"k1": 0.12},
    }
    c2ws = []
    for k in range(5):
        c2w = nadir_camera(4.0, 40.0, 80)
        c2w[0, 3] += 0.15 * k
        c2ws.append(c2w)
    cams = CameraSet(c2ws, {0: sensor})

    # distortion must change the rendered geometry vs the forced-off render
    r_auto = next(iter(mesh.render_flat(cams)))
    r_off = next(iter(mesh.render_flat(cams, apply_distortion=False)))
    assert not np.array_equal(
        np.nan_to_num(r_auto, nan=-1), np.nan_to_num(r_off, nan=-1)
    )

    renders = [r[..., 0] for r in mesh.render_flat(cams)]
    seg_cams = SegmentorCameraSet(cams, ArraySegmentor(renders, num_classes=3))

    avg, info = mesh.aggregate_projected_images(seg_cams)
    observed = info["projection_counts"] > 0
    assert observed.sum() > mesh.n_faces * 0.4
    pred = np.argmax(np.nan_to_num(avg), axis=1)
    assert (pred[observed] == labels[observed]).all()

    frac_sums, views = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3
    )
    # The distributed path rasterizes NATIVELY in the sensor's distorted
    # pixel space (sub-pixel-accurate), while the single-device path
    # NN-remaps a pinhole render (reference parity, meshes.py:1805-1821);
    # observation sets may differ by edge pixels of edge faces.
    dist_observed = views > 0
    agree = dist_observed == observed
    assert agree.mean() > 0.99
    pred_dist = np.argmax(frac_sums, axis=1)
    # faces seen only through cross-algorithm edge pixels can carry a
    # neighbor's label; require full parity on solidly observed faces
    solid = views >= 2
    core = solid & observed
    assert (pred_dist[core] == labels[core]).mean() > 0.97
    # distortion must be ON by default: the forced-off distributed run
    # observes a different face set / fractions
    frac_off, views_off = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, apply_distortion=False
    )
    assert not (
        np.array_equal(views_off, views)
        and np.allclose(frac_off, frac_sums)
    )
