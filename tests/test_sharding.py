"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geograypher_tpu.ops.aggregate import finalize_aggregation, AggregationState
from geograypher_tpu.ops.rasterize import RasterConfig
from geograypher_tpu.parallel.sharding import (
    make_view_mesh,
    shard_views_for_mesh,
    sharded_render_aggregate,
)
from geograypher_tpu.utils.fixtures import (
    gather_tri_verts,
    make_grid_mesh,
    nadir_camera,
)

CFG = RasterConfig(caps=(256, 64, 32, 16))


def test_eight_device_mesh_available():
    assert jax.device_count() == 8


def test_sharded_round_trip_matches_labels():
    verts, faces = make_grid_mesh(n=15, size=4.0)
    n_faces = faces.shape[0]
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 4, n_faces).astype(np.float32)

    # 11 views (not a multiple of 8 -> exercises padding/masking)
    w2cs, fs = [], []
    for k in range(11):
        c2w = nadir_camera(4.0, 40.0, 80)
        c2w[0, 3] += 0.1 * (k - 5)
        c2w[2, 3] += 0.05 * k
        w2cs.append(np.linalg.inv(c2w))
        fs.append(40.0)
    mesh = make_view_mesh()
    w2c, f, valid = shard_views_for_mesh(
        np.stack(w2cs), np.asarray(fs), mesh
    )
    tri = jnp.asarray(gather_tri_verts(verts, faces), jnp.float32)
    tex = jnp.asarray(labels)[:, None]

    vsum, vcount = sharded_render_aggregate(
        tri, tex, w2c, f, valid,
        image_w=80, image_h=80, n_faces=n_faces, config=CFG, mesh=mesh,
    )
    avg = np.asarray(
        finalize_aggregation(AggregationState(vsum, vcount))
    )[:, 0]
    observed = np.asarray(vcount) > 0
    assert observed.sum() > n_faces * 0.5
    assert np.allclose(avg[observed], labels[observed])
    # padding views contributed nothing
    assert np.asarray(vcount).max() <= 11


def test_distributed_pipeline_matches_single_device():
    """aggregate_class_images_distributed over 8 virtual devices must match
    the single-device TexturedMesh aggregation semantics exactly."""
    from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )
    from geograypher_tpu.predictors.segmentors import ArraySegmentor
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        nadir_camera,
    )
    from geograypher_tpu.cameras.core import CameraSet

    rng = np.random.default_rng(5)
    verts, faces = make_grid_mesh(n=13, size=4.0)
    mesh = TexturedMesh((verts, faces), raster_config=CFG)
    labels = rng.integers(0, 3, mesh.n_faces).astype(float)
    mesh.set_texture(labels, is_vertex=False)

    c2ws = []
    for k in range(5):  # not a device multiple
        c2w = nadir_camera(4.0, 40.0, 80)
        c2w[0, 3] += 0.15 * k
        c2ws.append(c2w)
    cams = CameraSet(
        c2ws,
        {0: {"f": 40.0, "cx": 0.0, "cy": 0.0,
             "image_width": 80, "image_height": 80}},
    )
    renders = [r[..., 0] for r in mesh.render_flat(cams)]
    seg_cams = SegmentorCameraSet(cams, ArraySegmentor(renders, num_classes=3))

    frac_sums, views = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3
    )
    # single-device reference: averages per-view fractions, view-weighted
    avg, info = mesh.aggregate_projected_images(seg_cams)
    observed = info["projection_counts"] > 0
    assert np.allclose(views[observed], info["projection_counts"][observed])
    with np.errstate(invalid="ignore"):
        frac = frac_sums / views[:, None]
    assert np.allclose(frac[observed], avg[observed], atol=1e-5, equal_nan=True)
    # and the argmax recovers the labels
    pred = np.argmax(frac_sums, axis=1)
    assert (pred[observed] == labels[observed]).all()


def _pipeline_scene(n_views=5, backend="pallas", seed=5):
    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.predictors.segmentors import ArraySegmentor

    rng = np.random.default_rng(seed)
    verts, faces = make_grid_mesh(n=13, size=4.0)
    cfg = RasterConfig(caps=(256, 64, 32, 16), backend=backend)
    mesh = TexturedMesh((verts, faces), raster_config=cfg)
    labels = rng.integers(0, 3, mesh.n_faces).astype(float)
    mesh.set_texture(labels, is_vertex=False)
    c2ws = []
    for k in range(n_views):
        c2w = nadir_camera(4.0, 40.0, 80)
        c2w[0, 3] += 0.15 * k
        c2ws.append(c2w)
    cams = CameraSet(
        c2ws,
        {0: {"f": 40.0, "cx": 0.0, "cy": 0.0,
             "image_width": 80, "image_height": 80}},
    )
    renders = [r[..., 0] for r in mesh.render_flat(cams)]
    seg_cams = SegmentorCameraSet(cams, ArraySegmentor(renders, num_classes=3))
    return mesh, cams, seg_cams, labels


@pytest.mark.slow
def test_distributed_pipeline_fused_backend_matches():
    """The FUSED (pallas) grouped pipeline — the production TPU path —
    must match the single-device aggregation exactly, with the integrity
    guards enabled."""
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )

    mesh, cams, seg_cams, labels = _pipeline_scene(backend="pallas")
    frac_sums, views = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, views_per_step=2,
    )
    avg, info = mesh.aggregate_projected_images(seg_cams)
    observed = info["projection_counts"] > 0
    assert np.allclose(views[observed], info["projection_counts"][observed])
    with np.errstate(invalid="ignore"):
        frac = frac_sums / views[:, None]
    assert np.allclose(frac[observed], avg[observed], atol=1e-5, equal_nan=True)
    pred = np.argmax(frac_sums, axis=1)
    assert (pred[observed] == labels[observed]).all()


def test_pipeline_resizes_on_undersized_fold_capacity(caplog):
    """Deliberately undersized fold windows must trigger the
    resize-and-retry path (VERDICT r4 #6) and still produce EXACT counts
    — never raise after partial work, never silently drop counts."""
    import logging

    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )

    mesh, cams, seg_cams, labels = _pipeline_scene(backend="pallas")
    import dataclasses

    undersized = dataclasses.replace(mesh.raster_config, fold_w_cap=8)
    with caplog.at_level(
        logging.WARNING, logger="geograypher_tpu.parallel.pipeline"
    ):
        frac_sums, views = aggregate_class_images_distributed(
            mesh, seg_cams, n_classes=3, auto_size_fold=False,
            integrity_check=False, config=undersized,
        )
    assert any("re-censusing" in r.message for r in caplog.records)
    avg, info = mesh.aggregate_projected_images(seg_cams)
    observed = info["projection_counts"] > 0
    assert np.allclose(views[observed], info["projection_counts"][observed])
    with np.errstate(invalid="ignore"):
        frac = frac_sums / views[:, None]
    assert np.allclose(frac[observed], avg[observed], atol=1e-5, equal_nan=True)


@pytest.mark.slow
def test_pipeline_benign_first_hostile_later(caplog):
    """A survey whose FIRST step (the one the capacities are probed on)
    is benign nadir and whose LATER steps contain a hostile oblique must
    complete with correct counts, re-sizing only the offending steps
    (VERDICT r4 #6 done-criterion)."""
    import dataclasses
    import logging

    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.cameras.segmentor_set import SegmentorCameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )
    from geograypher_tpu.parallel.planner import (
        _build_window_stats,
        pack_camera_batch,
    )
    from geograypher_tpu.predictors.segmentors import ArraySegmentor
    from geograypher_tpu.utils.fixtures import oblique_camera

    rng = np.random.default_rng(7)
    verts, faces = make_grid_mesh(
        n=13, size=4.0, z_fn=lambda x, y: 0.1 * np.sin(3 * x)
    )
    cfg = RasterConfig(caps=(256, 64, 32, 16), backend="pallas")
    mesh = TexturedMesh((verts, faces), raster_config=cfg)
    labels = rng.integers(0, 3, mesh.n_faces).astype(float)
    mesh.set_texture(labels, is_vertex=False)
    # 8 benign nadir views (= exactly the first 8-device step), then 4
    # hostile obliques in the second step
    c2ws = []
    for k in range(8):
        c2w = nadir_camera(4.0, 40.0, 80)
        c2w[0, 3] += 0.1 * k
        c2ws.append(c2w)
    for k in range(4):
        c2ws.append(
            oblique_camera(4.0, 55.0, 80, pitch_deg=42.0,
                           azimuth_deg=90.0 * k)
        )
    sensor0 = {"f": 40.0, "cx": 0.0, "cy": 0.0,
               "image_width": 80, "image_height": 80}
    cams = CameraSet(
        c2ws,
        {0: sensor0, 1: dict(sensor0, f=55.0)},
        sensor_IDs=[0] * 8 + [1] * 4,
    )
    # measure the true per-view fold-window demands and pick a static
    # capacity that covers every nadir view but NOT the obliques
    batch = cams.get_camera_batch()
    params = pack_camera_batch(batch, np.ones(12, np.float32))
    tri_soa = mesh._tri_soa_device(cams)
    stats, _ = _build_window_stats(cfg, False, 80, 80, mesh.n_faces)
    wins = [
        int(np.asarray(stats(tri_soa, jnp.asarray(params[k]))[0]))
        for k in range(12)
    ]
    w_nadir, w_obl = max(wins[:8]), max(wins[8:])
    if w_obl <= w_nadir:
        pytest.skip(
            f"oblique demand {w_obl} does not exceed nadir {w_nadir} at "
            "this scale"
        )
    between = dataclasses.replace(
        cfg, fold_w_cap=8 * (-(-(w_nadir + 1) // 8))
    )
    renders = [r[..., 0] for r in mesh.render_flat(cams)]
    seg_cams = SegmentorCameraSet(
        cams, ArraySegmentor(renders, num_classes=3)
    )
    with caplog.at_level(
        logging.WARNING, logger="geograypher_tpu.parallel.pipeline"
    ):
        frac_sums, views = aggregate_class_images_distributed(
            mesh, seg_cams, n_classes=3, auto_size_fold=False,
            integrity_check=False, config=between,
        )
    resizes = [r for r in caplog.records if "re-censusing" in r.message]
    assert resizes, "hostile oblique step did not trigger the resize path"
    # only the hostile step's views were re-run
    assert "4 views in 1 steps" in resizes[0].message
    avg, info = mesh.aggregate_projected_images(seg_cams)
    observed = info["projection_counts"] > 0
    assert np.allclose(views[observed], info["projection_counts"][observed])
    with np.errstate(invalid="ignore"):
        frac = frac_sums / views[:, None]
    assert np.allclose(frac[observed], avg[observed], atol=1e-5, equal_nan=True)


def test_pipeline_warmup_guard_detects_corruption(monkeypatch):
    """The warmup guard must fail when the grouped program's counts
    disagree with the standalone single-view reference (simulated Mosaic
    corruption)."""
    import geograypher_tpu.parallel.pipeline as pipeline_mod
    from geograypher_tpu.ops.rasterize import rasterize_and_count

    mesh, cams, seg_cams, _ = _pipeline_scene(backend="pallas")

    def inflated(*args, **kwargs):
        # the "reference" computation claims 10x the pixels: as if the
        # grouped program had silently dropped ~90% of its counts
        return rasterize_and_count(*args, **kwargs) * 10.0

    monkeypatch.setattr(pipeline_mod, "rasterize_and_count", inflated)
    # the jitted single-view program is built once per static config and
    # cached; drop it so the patched reference is traced
    pipeline_mod._build_one_view_counts.cache_clear()
    try:
        with pytest.raises(RuntimeError, match="integrity check failed"):
            pipeline_mod.aggregate_class_images_distributed(
                mesh, seg_cams, n_classes=3
            )
    finally:
        # don't leak the inflated traced program to later tests
        pipeline_mod._build_one_view_counts.cache_clear()


@pytest.mark.slow
def test_distributed_pipeline_subtile_auto_size():
    """The distributed pipeline census-sizes level-S chunk capacities from
    a probe view when handed an UNsized subtile config, and matches the
    plain tile-path result."""
    import dataclasses

    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )

    mesh, cams, seg_cams, labels = _pipeline_scene()
    base = RasterConfig(
        caps=(64, 16, 16, 16), backend="pallas", bin_block=8,
        l0_window=(5, 2),
    )
    s_cfg = dataclasses.replace(
        base, subtile=(8, 16), s_window=(3, 2), s_block=4
    )
    fr_p, v_p = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, config=base
    )
    fr_s, v_s = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, config=s_cfg
    )
    assert np.allclose(v_p, v_s)
    # knife-edge winner flips move a little fraction mass between
    # adjacent faces (the labels were rendered with the plain config);
    # the semantics must survive: same total mass, and the argmax
    # recovers the ground-truth face labels
    assert abs(fr_p.sum() - fr_s.sum()) <= 0.005 * fr_p.sum() + 1
    observed = v_s > 0
    pred = np.argmax(fr_s, axis=1)
    assert (pred[observed] == labels[observed]).all()


def test_rle_class_image_round_trip():
    """Host RLE encode -> device scatter/cumsum decode is exact, including
    -1 background and the capacity-overflow None contract."""
    from geograypher_tpu.parallel.pipeline import (
        _rle_decode_device,
        _rle_encode_class_image,
    )

    rng = np.random.default_rng(3)
    # coherent blobby labels with -1 background
    yy, xx = np.mgrid[0:40, 0:64]
    img = np.where(
        np.sin(xx * 0.2) * np.cos(yy * 0.31) > 0.4,
        -1,
        (np.sin(xx * 0.1 + yy * 0.07) * 2 + 2).astype(np.int32),
    ).astype(np.int8)
    enc = _rle_encode_class_image(img, cap=4096)
    assert enc is not None
    starts, deltas, n_runs = enc
    assert deltas.dtype == np.int8 and 0 < n_runs <= 4096
    dec = np.asarray(
        _rle_decode_device(jnp.asarray(starts), jnp.asarray(deltas), 40, 64)
    )
    assert (dec == img).all()
    # worst-case alternating image exceeds a small capacity -> None
    noisy = (np.arange(40 * 64).reshape(40, 64) % 2).astype(np.int8)
    assert _rle_encode_class_image(noisy, cap=64) is None
    # and round-trips at full capacity
    enc2 = _rle_encode_class_image(noisy, cap=40 * 64)
    dec2 = np.asarray(
        _rle_decode_device(
            jnp.asarray(enc2[0]), jnp.asarray(enc2[1]), 40, 64
        )
    )
    assert (dec2 == noisy).all()


def test_pipeline_rle_transport_matches_dense():
    """label_transport="rle" must produce bit-identical aggregation to
    "dense" (the decode is exact), at ~10-100x fewer transferred bytes."""
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )

    mesh, cams, seg_cams, labels = _pipeline_scene(backend="pallas")
    fr_d, v_d = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, label_transport="dense",
    )
    fr_r, v_r = aggregate_class_images_distributed(
        mesh, seg_cams, n_classes=3, label_transport="rle",
    )
    assert (v_d == v_r).all()
    assert np.array_equal(fr_d, fr_r)


def test_pipeline_rle_overflow_falls_back_to_dense_step(caplog):
    """A later step whose image exceeds the probed RLE capacity must fall
    back to the dense program for that step and stay exact."""
    import logging as _logging

    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )

    mesh, cams, seg_cams, labels = _pipeline_scene(backend="pallas", n_views=9)
    renders = [
        np.asarray(r[..., 0]) for r in mesh.render_flat(cams)
    ]
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 3, renders[0].shape).astype(np.int32)

    def provider(i):
        if i == 8:  # last view: incompressible noise
            return noise
        return np.nan_to_num(renders[i], nan=-1).astype(np.int32)

    # views_per_step=1 -> 8-view steps: the noisy view 8 lands in the
    # SECOND step, beyond the first-step capacity probe.  The legacy
    # (auto_size_fold=False) path keeps identity view order — the planned
    # path may reorder view 8 into the probed first step, which defeats
    # this test's premise (the fallback itself is transport-layer code
    # shared by both paths).
    fr_d, v_d = aggregate_class_images_distributed(
        mesh, cams, n_classes=3, class_image_provider=provider,
        label_transport="dense", views_per_step=1, auto_size_fold=False,
    )
    with caplog.at_level(_logging.WARNING, logger="geograypher_tpu.parallel.pipeline"):
        fr_r, v_r = aggregate_class_images_distributed(
            mesh, cams, n_classes=3, class_image_provider=provider,
            label_transport="rle", views_per_step=1, auto_size_fold=False,
        )
    assert any("RLE capacity" in r.message for r in caplog.records)
    assert (v_d == v_r).all()
    assert np.array_equal(fr_d, fr_r)
