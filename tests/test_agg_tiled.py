"""Scatter-free tiled aggregation must match the segment-sum reference
exactly (integer pixel counts) on both raster backends."""

import jax.numpy as jnp
import numpy as np
import pytest

from geograypher_tpu.ops.agg_tiled import (
    face_counts_from_tiles,
    project_image_class_counts_tiled,
)
from geograypher_tpu.ops.aggregate import project_image_class_counts
from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    rasterize_setup,
    setup_triangles,
    transform_to_camera,
)
from geograypher_tpu.utils.fixtures import (
    gather_tri_verts,
    make_grid_mesh,
    nadir_camera,
)

H, W = 144, 272  # deliberately NOT multiples of the (8, 128) tile
N_CLASSES = 7


def _scene(n_grid=41, focal=140.0, z_fn=None):
    verts, faces = make_grid_mesh(n=n_grid, size=4.0, z_fn=z_fn)
    tri = jnp.asarray(gather_tri_verts(verts, faces), jnp.float32)
    c2w = nadir_camera(4.0, focal, W)
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    cam_tris = transform_to_camera(tri, w2c)
    setup = setup_triangles(cam_tris, jnp.float32(focal), W, H)
    return setup, faces.shape[0]


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_tiled_counts_match_segment_sum(backend):
    config = RasterConfig(caps=(128, 64, 32, 32), backend=backend)
    setup, n_faces = _scene(z_fn=lambda x, y: 0.15 * np.sin(2 * x) * y)
    p2f_img, binned = rasterize_setup(setup, config, H, W)
    p2f_tiles, _ = rasterize_setup(setup, config, H, W, return_tiles=True)

    rng = np.random.default_rng(3)
    cls = jnp.asarray(rng.integers(-1, N_CLASSES, (H, W)), jnp.int32)

    ref = project_image_class_counts(p2f_img, cls, n_faces, N_CLASSES)
    got, over = project_image_class_counts_tiled(
        p2f_tiles, cls, binned, config, H, W, n_faces, N_CLASSES
    )
    assert int(over) == 0
    assert got.shape == (n_faces, N_CLASSES)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tiled_counts_with_global_level_faces():
    """A mesh with one screen-filling triangle exercises the L2/global
    candidate paths."""
    config = RasterConfig(caps=(256, 256, 64, 32), backend="xla")
    verts, faces = make_grid_mesh(n=17, size=4.0)
    # huge triangle floating above the grid covering the left half-screen
    big = np.array(
        [[-2.0, -2.0, 1.0], [0.2, -2.0, 1.0], [-2.0, 2.0, 1.0]]
    )
    tri = np.concatenate([gather_tri_verts(verts, faces), big[None]], axis=0)
    n_faces = tri.shape[0]
    c2w = nadir_camera(4.0, 140.0, W)
    cam_tris = transform_to_camera(
        jnp.asarray(tri, jnp.float32),
        jnp.asarray(np.linalg.inv(c2w), jnp.float32),
    )
    setup = setup_triangles(cam_tris, jnp.float32(140.0), W, H)
    p2f_img, binned = rasterize_setup(setup, config, H, W)
    p2f_tiles, _ = rasterize_setup(setup, config, H, W, return_tiles=True)
    assert int(binned.overflow) == 0

    rng = np.random.default_rng(5)
    cls = jnp.asarray(rng.integers(0, N_CLASSES, (H, W)), jnp.int32)
    ref = project_image_class_counts(p2f_img, cls, n_faces, N_CLASSES)
    got, over = project_image_class_counts_tiled(
        p2f_tiles, cls, binned, config, H, W, n_faces, N_CLASSES
    )
    assert int(over) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the big face must actually have been rendered and counted
    assert float(ref[-1].sum()) > 0


def test_face_counts_from_tiles_direct():
    """Stage 2 alone: random sparse tile counts vs a numpy scatter."""
    rng = np.random.default_rng(11)
    t, kp, s, n_faces = 23, 16, 64, 5000
    ids = np.full((t, s), -1, np.int32)
    counts = np.zeros((t, kp, s), np.float32)
    for i in range(t):
        base = rng.integers(0, n_faces - 400)
        k = rng.integers(1, s + 1)
        vals = np.sort(rng.choice(400, size=k, replace=False)) + base
        ids[i, :k] = vals
        counts[i, :, :k] = rng.integers(0, 1024, (kp, k))
    dense = face_counts_from_tiles(
        jnp.asarray(counts), jnp.asarray(ids), n_faces=n_faces
    )
    expect = np.zeros((n_faces, kp), np.float32)
    for i in range(t):
        for j in range(s):
            if ids[i, j] >= 0:
                expect[ids[i, j]] += counts[i, :, j]
    np.testing.assert_array_equal(np.asarray(dense)[:n_faces], expect)


@pytest.mark.parametrize("z_fn", [None, lambda x, y: 0.15 * np.sin(2 * x) * y])
def test_fused_raster_counts_match_segment_sum(z_fn):
    """The fused rasterize_and_count (in-kernel match on the pallas
    backend) must equal the plain rasterize + segment-sum counts."""
    from geograypher_tpu.ops.rasterize import rasterize_and_count

    config = RasterConfig(caps=(128, 64, 32, 32), backend="pallas")
    setup, n_faces = _scene(z_fn=z_fn)
    p2f_img, _ = rasterize_setup(setup, config, H, W)

    rng = np.random.default_rng(5)
    cls = jnp.asarray(rng.integers(-1, N_CLASSES, (H, W)), jnp.int32)

    ref = project_image_class_counts(p2f_img, cls, n_faces, N_CLASSES)
    got = rasterize_and_count(setup, cls, config, H, W, n_faces, N_CLASSES)
    assert got.shape == (n_faces, N_CLASSES)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_raster_counts_global_level():
    """Fused counts with a screen-filling triangle (global-list path)."""
    from geograypher_tpu.ops.rasterize import rasterize_and_count

    config = RasterConfig(caps=(128, 64, 32, 32), backend="pallas")
    verts, faces = make_grid_mesh(n=11, size=4.0)
    big = np.array([[len(verts), len(verts) + 1, len(verts) + 2]])
    verts = np.concatenate(
        [verts, np.array([[-6.0, -6.0, 0.5], [6.0, -6.0, 0.5], [0.0, 9.0, 0.5]])]
    )
    faces = np.concatenate([faces, big]).astype(np.int64)
    tri = jnp.asarray(gather_tri_verts(verts, faces), jnp.float32)
    c2w = nadir_camera(4.0, 140.0, W)
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    setup = setup_triangles(
        transform_to_camera(tri, w2c), jnp.float32(140.0), W, H
    )
    p2f_img, _ = rasterize_setup(setup, config, H, W)

    rng = np.random.default_rng(7)
    cls = jnp.asarray(rng.integers(0, N_CLASSES, (H, W)), jnp.int32)
    ref = project_image_class_counts(p2f_img, cls, len(faces), N_CLASSES)
    got = rasterize_and_count(
        setup, cls, config, H, W, len(faces), N_CLASSES
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_raster_counts_block_binning():
    """Fused counts under bin_block=8 equal the same-backend pix2face +
    segment-sum reference exactly (including fold id expansion)."""
    from geograypher_tpu.ops.rasterize import rasterize_and_count

    config = RasterConfig(caps=(32, 16, 8, 8), backend="pallas", bin_block=8)
    setup, n_faces = _scene(z_fn=lambda x, y: 0.15 * np.sin(2 * x) * y)
    p2f_img, _ = rasterize_setup(setup, config, H, W)

    rng = np.random.default_rng(9)
    cls = jnp.asarray(rng.integers(-1, N_CLASSES, (H, W)), jnp.int32)
    ref = project_image_class_counts(p2f_img, cls, n_faces, N_CLASSES)
    got = rasterize_and_count(setup, cls, config, H, W, n_faces, N_CLASSES)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_counts_entry_compaction_parity():
    """entry_caps compaction (occupied-chunk gather after each view's
    raster) must be invisible in the output: caps sized from
    entry_occupancy give bit-identical counts and zero overflow, and
    undersized caps report dropped entries instead of failing silently."""
    import dataclasses

    from geograypher_tpu.ops.agg_tiled import entry_occupancy
    from geograypher_tpu.ops.rasterize import (
        bin_triangles,
        fused_view_class_counts,
        rasterize_and_count,
    )

    config = RasterConfig(caps=(32, 16, 8, 8), backend="pallas", bin_block=8)
    setup, n_faces = _scene(z_fn=lambda x, y: 0.15 * np.sin(2 * x) * y)
    rng = np.random.default_rng(11)
    cls = jnp.asarray(rng.integers(-1, N_CLASSES, (H, W)), jnp.int32)

    ref = rasterize_and_count(setup, cls, config, H, W, n_faces, N_CLASSES)

    binned = bin_triangles(setup, config, H, W)
    occ = np.asarray(entry_occupancy(binned, config, H, W))
    assert occ.sum() > 0
    sized = dataclasses.replace(config, entry_caps=tuple(int(v) for v in occ))
    got = rasterize_and_count(setup, cls, sized, H, W, n_faces, N_CLASSES)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # exact-occupancy caps: zero overflow through the guarded fused path
    from geograypher_tpu.ops import agg_tiled
    from geograypher_tpu.ops.pallas_raster import raster_tiles_pallas

    _p2f, outs, _kp = raster_tiles_pallas(
        binned, setup.planes, sized, H, W, return_tiles=True,
        class_image=cls, n_classes=N_CLASSES, return_pix2face=False,
    )
    counts, over = agg_tiled.fold_tile_counts(
        outs, binned, sized, H, W, n_faces, N_CLASSES,
        w_cap=sized.fold_w_cap, return_overflow=True,
    )
    assert int(np.asarray(over)) == 0
    np.testing.assert_array_equal(np.asarray(counts[:n_faces]), np.asarray(ref))

    # undersized caps: overflow counts the dropped nonempty chunks
    starved = dataclasses.replace(config, entry_caps=(1, 1, 1))
    _c, over = agg_tiled.fold_tile_counts(
        outs, binned, starved, H, W, n_faces, N_CLASSES,
        w_cap=config.fold_w_cap, return_overflow=True,
    )
    assert int(np.asarray(over)) == sum(max(0, int(v) - 1) for v in occ)


def test_fold_rejects_unsupported_level_scale():
    """level_scales[1] > 4 breaks the 2-digit-plane count exactness bound
    and the gx grid grouping — the fold must refuse, not corrupt."""
    import dataclasses

    import pytest

    from geograypher_tpu.ops.agg_tiled import (
        fold_tile_counts,
        fold_tile_counts_grouped,
    )
    from geograypher_tpu.ops.rasterize import RasterConfig

    cfg = dataclasses.replace(
        RasterConfig(caps=(16, 16, 16, 16)), level_scales=(1, 8, 16)
    )
    with pytest.raises(ValueError, match="level_scales"):
        fold_tile_counts(None, None, cfg, 64, 64, 10, 3)
    with pytest.raises(ValueError, match="level_scales"):
        fold_tile_counts_grouped([], cfg, 64, 64, 10, 3)


def test_unit_fold_matches_legacy_kernel():
    """The unit-granular stage-2 kernel (8-aligned entry runs) must be
    bit-exact against the face-slot radix kernel on random entries,
    including wide id spans, empty units, planes=4, and window caps."""
    import numpy as np

    from geograypher_tpu.ops.agg_tiled import face_counts_from_tiles

    rng = np.random.default_rng(3)
    n_faces = 4096 * 3 + 100
    e, kp = 160, 10
    units = rng.integers(0, (n_faces // 8) - 1, (e, 16))
    # empty units + a few very wide entries (ids across many blocks)
    units[rng.random((e, 16)) < 0.2] = -1
    ids = np.where(
        units[..., None] >= 0,
        units[..., None] * 8 + np.arange(8),
        -1,
    ).reshape(e, 128).astype(np.int32)
    counts = (
        rng.integers(0, 200, (e, kp, 128)).astype(np.float32)
        * (ids >= 0)[:, None, :]
    )

    w_cap = 8 * ((e * 5 // 4) // 8)
    for planes in (2, 4):
        legacy, over_l = face_counts_from_tiles(
            jnp.asarray(counts), jnp.asarray(ids),
            n_faces=n_faces, block=4096, planes=planes,
            w_cap=w_cap, units_aligned=False, return_overflow=True,
        )
        unit, over_u = face_counts_from_tiles(
            jnp.asarray(counts), jnp.asarray(ids),
            n_faces=n_faces, block=4096, planes=planes,
            w_cap=w_cap, units_aligned=True, return_overflow=True,
        )
        assert int(over_l) == 0 and int(over_u) == 0
        legacy, unit = np.asarray(legacy), np.asarray(unit)
        assert np.array_equal(legacy, unit), (
            planes, np.abs(legacy - unit).max(),
        )

    # undersized window cap: both paths REPORT the drops (which subset
    # of boundary entries is dropped may differ — callers raise on any
    # nonzero overflow, so only the accounting is contractual)
    _, over_u = face_counts_from_tiles(
        jnp.asarray(counts), jnp.asarray(ids), n_faces=n_faces,
        block=4096, planes=2, w_cap=48, units_aligned=True,
        return_overflow=True,
    )
    assert int(over_u) > 0
