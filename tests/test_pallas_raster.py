"""Pallas kernel equivalence vs the XLA reference kernel (interpret mode on
CPU; the same code compiles for real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    rasterize_triangles,
)
from geograypher_tpu.utils.fixtures import (
    gather_tri_verts,
    make_grid_mesh,
    nadir_camera,
)
from tests.test_rasterize import cam_tris

XLA = RasterConfig(caps=(256, 64, 32, 32), backend="xla")
PAL = RasterConfig(caps=(256, 64, 32, 32), backend="pallas")


def run_both(tris, f, w, h, caps=None):
    kw = {}
    xla_cfg, pal_cfg = XLA, PAL
    if caps:
        xla_cfg = RasterConfig(caps=caps, backend="xla")
        pal_cfg = RasterConfig(caps=caps, backend="pallas")
    a = np.asarray(
        rasterize_triangles(jnp.asarray(tris, jnp.float32),
                            jnp.asarray(f, jnp.float32),
                            image_w=w, image_h=h, config=xla_cfg)
    )
    b = np.asarray(
        rasterize_triangles(jnp.asarray(tris, jnp.float32),
                            jnp.asarray(f, jnp.float32),
                            image_w=w, image_h=h, config=pal_cfg)
    )
    return a, b


def assert_equiv(a, b, min_agree=0.99):
    """The hi/lo level-0 fast path can flip knife-edge pixels whose edge
    value is within ~1e-3 px of zero; such pixels tie between the two
    triangles sharing that edge, so either answer is correct.  Require
    near-total agreement and that every disagreement is a valid-face swap
    (never background vs face)."""
    agree = a == b
    assert agree.mean() >= min_agree, f"agreement {agree.mean():.4f}"
    bad = ~agree
    if bad.any():
        assert (a[bad] >= 0).all() and (b[bad] >= 0).all()


def test_pallas_matches_xla_bumpy_mesh():
    verts, faces = make_grid_mesh(
        n=15, size=4.0, z_fn=lambda x, y: 0.25 * np.sin(2 * x) * np.cos(y)
    )
    c2w = nadir_camera(4.0, 50.0, 80)
    tris = cam_tris(verts, faces, c2w)
    a, b = run_both(tris, 50.0, 80, 80)
    assert_equiv(a, b)
    assert (a >= 0).any()


def test_pallas_matches_xla_mixed_sizes():
    rng = np.random.default_rng(11)
    n = 50
    centers = np.concatenate(
        [rng.uniform(-1.5, 1.5, (n, 2)), rng.uniform(2, 6, (n, 1))], axis=1
    )
    sizes = rng.choice([0.02, 0.15, 1.0], n)[:, None]
    offs = rng.uniform(-1, 1, (n, 3, 2))
    tris = np.zeros((n, 3, 3))
    tris[:, :, :2] = centers[:, None, :2] + offs * sizes[:, None]
    tris[:, :, 2] = centers[:, None, 2]
    a, b = run_both(tris, 60.0, 256, 64)
    assert_equiv(a, b)
    assert (a >= 0).any() and (a == -1).any()


def test_pallas_occlusion_and_multichunk():
    """>128 candidates in one tile forces multiple dynamic chunks."""
    v_lo, f_lo = make_grid_mesh(n=17, size=1.2)  # 512 small faces, center
    v_hi, f_hi = make_grid_mesh(n=3, size=0.5, offset=(0.0, 0.0, 1.0))
    verts = np.concatenate([v_lo, v_hi], axis=0)
    faces = np.concatenate([f_lo, f_hi + v_lo.shape[0]], axis=0)
    c2w = nadir_camera(4.0, 100.0, 200)
    tris = cam_tris(verts, faces, c2w)
    a, b = run_both(tris, 100.0, 200, 200, caps=(768, 64, 32, 16))
    assert_equiv(a, b)
    assert (a[100, 100] >= f_lo.shape[0])  # raised plane wins depth
    assert (b[100, 100] >= f_lo.shape[0])


def test_pallas_block_binning_matches_xla():
    """bin_block=8 (block-granular binning, the TPU production setting)
    must reproduce the face-granular XLA reference."""
    verts, faces = make_grid_mesh(
        n=15, size=4.0, z_fn=lambda x, y: 0.25 * np.sin(2 * x) * np.cos(y)
    )
    assert faces.shape[0] % 8 == 0
    c2w = nadir_camera(4.0, 50.0, 80)
    tris = cam_tris(verts, faces, c2w)
    a = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=XLA,
        )
    )
    blk = RasterConfig(caps=(64, 16, 8, 8), backend="pallas", bin_block=8)
    b = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=blk,
        )
    )
    assert_equiv(a, b)
    assert (b >= 0).any()


def test_pallas_block_binning_unordered_faces():
    """Blocks of spatially-UNRELATED faces (permuted order) are slower but
    must stay exactly correct (ride-along faces are inert)."""
    rng = np.random.default_rng(4)
    verts, faces = make_grid_mesh(n=9, size=4.0)
    faces = faces[rng.permutation(faces.shape[0])]
    c2w = nadir_camera(4.0, 50.0, 80)
    tris = cam_tris(verts, faces, c2w)
    a = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=XLA,
        )
    )
    blk = RasterConfig(caps=(64, 32, 32, 32), backend="pallas", bin_block=8)
    b = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=blk,
        )
    )
    assert_equiv(a, b)


def test_pallas_l0_window3_matches_xla():
    """A 3x3 level-0 window (keeps tall oblique bboxes out of the L1
    resolve) must reproduce the 2x2 XLA reference exactly."""
    verts, faces = make_grid_mesh(
        n=15, size=4.0, z_fn=lambda x, y: 0.25 * np.sin(2 * x) * np.cos(y)
    )
    c2w = nadir_camera(4.0, 50.0, 80)
    # zoom in so faces span several 8-px tile rows (the l0_window case)
    tris = cam_tris(verts, faces, c2w)
    a = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(160.0),
            image_w=160, image_h=96, config=XLA,
        )
    )
    w3 = RasterConfig(
        caps=(64, 16, 8, 8), backend="pallas", bin_block=8, l0_window=3
    )
    b = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(160.0),
            image_w=160, image_h=96, config=w3,
        )
    )
    assert_equiv(a, b)
    assert (b >= 0).any()


def test_pallas_oblique_deep_overdraw_matches_xla():
    """Oblique view over a bumpy mesh: deep multi-chunk far-field tiles
    (the adversarial-workload shape) against the XLA reference."""
    from geograypher_tpu.utils.fixtures import oblique_camera

    verts, faces = make_grid_mesh(
        n=41, size=4.0, z_fn=lambda x, y: 0.2 * np.sin(3 * x) * np.cos(2 * y)
    )
    c2w = oblique_camera(3.0, 90.0, 160, pitch_deg=32.0, azimuth_deg=135.0)
    tris = cam_tris(verts, faces, c2w)
    a, b = run_both(tris, 90.0, 160, 96, caps=(512, 64, 32, 16))
    assert_equiv(a, b)
    assert (a >= 0).any()


def test_kernel_config_guards():
    """Invalid configs fail loudly instead of lowering corrupt kernels:
    odd pair, s2 not a multiple of s1, and the 2^24 face-id budget."""
    import dataclasses

    import pytest

    from geograypher_tpu.ops.rasterize import (
        RasterConfig, l0_geometry, setup_from_soa, tri_to_soa,
    )
    from geograypher_tpu.ops.pallas_raster import raster_tiles_pallas
    from geograypher_tpu.ops.rasterize import bin_triangles
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts, make_grid_mesh, nadir_camera,
    )

    w = 384  # > 2 L0 tile columns so an explicit pair takes effect
    verts, faces = make_grid_mesh(n=5, size=4.0)
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    c2w = nadir_camera(4.0, 40.0, w)
    soa = jnp.asarray(tri_to_soa(tv))
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)

    def run(cfg):
        setup = setup_from_soa(soa, w2c, 40.0, w, 80, cfg.znear)
        binned = bin_triangles(setup, cfg, 80, w)
        return raster_tiles_pallas(binned, setup.planes, cfg, 80, w)

    base = RasterConfig(caps=(64, 16, 16, 16), backend="pallas")
    with pytest.raises(ValueError, match="pair"):
        run(dataclasses.replace(base, pair=3, level_scales=(1, 3, 9)))
    with pytest.raises(ValueError, match="multiple"):
        run(dataclasses.replace(base, level_scales=(1, 4, 6)))


def test_pallas_l0_group1_matches_group2():
    """l0_group=1 (each L0 tile resolved to its own candidate count) must
    be BIT-IDENTICAL to the default grouped resolve (same math, same tie
    rules — only the loop bound / dot width differ)."""
    import dataclasses

    verts, faces = make_grid_mesh(
        n=15, size=4.0, z_fn=lambda x, y: 0.25 * np.sin(2 * x) * np.cos(y)
    )
    c2w = nadir_camera(4.0, 50.0, 80)
    tris = cam_tris(verts, faces, c2w)
    base = RasterConfig(
        caps=(64, 16, 16, 16), backend="pallas", bin_block=8,
        l0_window=(5, 2),
    )
    g1 = dataclasses.replace(base, l0_group=1)
    a = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=base,
        )
    )
    b = np.asarray(
        rasterize_triangles(
            jnp.asarray(tris, jnp.float32), jnp.float32(50.0),
            image_w=80, image_h=80, config=g1,
        )
    )
    assert (a == b).all()
    assert (a >= 0).any()


def test_pallas_l0_group_guard():
    import dataclasses

    import jax
    from geograypher_tpu.ops.rasterize import (
        bin_all,
        setup_from_soa,
        tri_to_soa,
    )
    from geograypher_tpu.ops.pallas_raster import raster_tiles_pallas

    verts, faces = make_grid_mesh(n=9, size=4.0)
    c2w = nadir_camera(4.0, 50.0, 80)
    tris = cam_tris(verts, faces, c2w)
    cfg = dataclasses.replace(
        RasterConfig(caps=(64, 16, 16, 16), backend="pallas", pair=2),
        l0_group=3,
    )
    tri = jnp.asarray(tri_to_soa(np.asarray(tris, np.float32)))
    setup = setup_from_soa(tri, jnp.eye(4), jnp.float32(50.0), 256, 80)
    binned, _sb = bin_all(setup, cfg, 80, 256)
    with pytest.raises(ValueError, match="l0_group"):
        raster_tiles_pallas(binned, setup.planes, cfg, 80, 256)
