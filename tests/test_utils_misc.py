"""geometric / indexing / visualization / profiling utility tests."""

import numpy as np
import pytest

from geograypher_tpu.utils.geometric import (
    angle_between,
    get_scale_from_transform,
    projection_onto_plane,
)
from geograypher_tpu.utils.indexing import (
    determine_IDs_to_labels,
    find_argmax_nonzero_value,
    inverse_map_interpolation,
)


def test_scale_from_transform():
    t = np.eye(4)
    t[:3, :3] *= 2.5
    assert np.isclose(get_scale_from_transform(t), 2.5)
    assert get_scale_from_transform(None) == 1.0


def test_angle_between():
    assert np.isclose(angle_between([1, 0, 0], [0, 1, 0]), np.pi / 2)
    assert np.isclose(angle_between([1, 0, 0], [1, 0, 0]), 0.0)
    v1 = np.array([[1, 0, 0], [0, 0, 2]])
    v2 = np.array([[0, 2, 0], [0, 0, -1]])
    assert np.allclose(angle_between(v1, v2), [np.pi / 2, np.pi])


def test_projection_onto_plane():
    out = projection_onto_plane([1.0, 2.0, 3.0], [0.0, 0.0, 1.0])
    assert np.allclose(out, [1, 2, 0])


def test_find_argmax_nonzero():
    arr = np.array([[0.0, 3.0], [0.0, 0.0], [np.inf, 1.0]])
    out = find_argmax_nonzero_value(arr)
    assert out[0] == 1 and np.isnan(out[1]) and np.isnan(out[2])


def test_determine_ids_to_labels():
    assert determine_IDs_to_labels(np.array([0.5, 1.7])) is None
    out = determine_IDs_to_labels(np.array([3.0, 5.0, 3.0]))
    assert out == {0: 3.0, 1: 5.0}
    out = determine_IDs_to_labels(np.array([3.0, 5.0]), background_ID=0)
    assert out == {1: 3.0, 2: 5.0}


def test_inverse_map_interpolation_identity_shift():
    """Invert a pure +2 pixel shift map (spirit of reference
    tests/test_indexing.py:7-61)."""
    H, W = 16, 20
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fwd = np.stack([ii + 2.0, jj + 3.0], axis=0)
    inv = inverse_map_interpolation(fwd)
    interior = (slice(4, H - 4), slice(5, W - 4))
    assert np.allclose(inv[0][interior], ii[interior] - 2.0, atol=1e-6)
    assert np.allclose(inv[1][interior], jj[interior] - 3.0, atol=1e-6)


def test_composite_and_frustum():
    from geograypher_tpu.utils.visualization import (
        camera_frustum_mesh,
        create_composite,
    )

    rgb = np.random.default_rng(0).integers(0, 255, (8, 10, 3)).astype(np.uint8)
    lab = np.full((8, 10), np.nan)
    lab[2:4, 3:6] = 1.0
    comp = create_composite(rgb, lab, {0: "a", 1: "b"})
    assert comp.shape == (8, 30, 3)

    verts, faces, colors = camera_frustum_mesh(
        np.eye(4), 100.0, 0.0, 0.0, 200, 100, frustum_scale=0.5
    )
    assert verts.shape == (5, 3) and faces.shape == (6, 3)
    assert np.allclose(verts[0], [0, 0, 0])


def test_stage_timer():
    from geograypher_tpu.utils.profiling import stage_timer

    stage_timer.reset()
    with stage_timer("x"):
        pass
    with stage_timer("x"):
        pass
    assert stage_timer.counts["x"] == 2
    assert "x" in stage_timer.report()


def test_triangulate_rays_lstsq():
    from geograypher_tpu.ops.triangulate import triangulate_rays_lstsq

    target = np.array([2.0, -1.0, 4.0])
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(8, 3))
    starts = target - dirs * rng.uniform(1, 5, (8, 1))
    out = triangulate_rays_lstsq(starts, dirs)
    assert np.allclose(out, target, atol=1e-8)


def test_overlap_vector_and_raster(tmp_path):
    from geograypher_tpu.utils.geospatial import (
        ensure_non_overlapping_polygons,
        get_overlap_raster,
        get_overlap_vector,
    )
    from geograypher_tpu.utils.raster import Raster, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    def sq(x0, y0, s):
        return Polygon(np.array([[x0, y0], [x0+s, y0], [x0+s, y0+s], [x0, y0+s]]))

    classified = VectorData(
        [sq(0, 0, 10), sq(10, 0, 10)], {"cls": ["a", "b"]}, epsg=32611
    )
    query = VectorData([sq(5, 2, 10)], epsg=32611)  # half over a, half b
    areas, names = get_overlap_vector(query, classified, "cls", grid=512)
    assert names == ["a", "b"]
    assert abs(areas[0, 0] - areas[0, 1]) / areas[0].sum() < 0.1
    # exact mode: x-overlap 5 x y-overlap 8 = 40 m^2 with each class
    areas_e, names_e = get_overlap_vector(
        query, classified, "cls", mode="exact"
    )
    assert names_e == ["a", "b"]
    np.testing.assert_allclose(areas_e, [[40.0, 40.0]], atol=1e-9)

    # raster version
    data = np.zeros((100, 100), np.uint8)
    data[:, 50:] = 1
    r = Raster(data, (0.2, 0, 0.0, 0, -0.2, 20.0), epsg=32611)
    rp = tmp_path / "cls.tif"
    write_geotiff(rp, r)
    counts, _ = get_overlap_raster(query, rp, num_classes=2)
    assert counts[0].sum() > 0
    assert counts[0, 0] > 0 and counts[0, 1] > 0

    # de-overlap: smaller polygon keeps its area
    overlapping = VectorData(
        [sq(0, 0, 10), sq(8, 0, 4)], {"id": [0, 1]}, epsg=32611
    )
    fixed = ensure_non_overlapping_polygons(overlapping)
    a0, a1 = fixed.geometries[0].area, fixed.geometries[1].area
    assert abs(a1 - 16) / 16 < 0.15  # small square intact
    assert a0 < 100  # big square lost the overlap


def test_hilbert_argsort_locality():
    """Hilbert order visits each point once and keeps a w x h box's index
    band O(w * h) — far tighter than row-major order's band."""
    from geograypher_tpu.utils.numeric import hilbert_argsort_2d

    n = 64
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1).astype(float)
    order = hilbert_argsort_2d(pts)
    assert sorted(order) == list(range(n * n))

    # index of each point along the curve
    rank = np.empty(n * n, np.int64)
    rank[order] = np.arange(n * n)
    # a wide, short query box (raster-tile shaped): 16 x 2 cells
    box = (pts[:, 0] < 16) & (pts[:, 1] < 2)
    band = rank[box].max() - rank[box].min()
    # row-major band would be ~n * (h - 1) + w = 80; hilbert stays near
    # the enclosing aligned square (16 x 16 = 256) at worst
    assert band <= 3 * 16 * 16
    # consecutive curve steps are unit neighbors on a grid
    cent = pts[order]
    step = np.linalg.norm(np.diff(cent, axis=0), axis=1)
    assert np.max(step) <= np.sqrt(2) + 1e-9


def test_serpentine_face_order_no_widefield_blocks():
    """Serpentine scanline order: consecutive-id blocks stay spatially
    compact ACROSS row turns (plain scanline wraps produce one
    image-wide block per mesh row, which falls to the coarse raster
    levels — see RasterConfig.bin_block)."""
    from geograypher_tpu.utils.fixtures import make_grid_mesh
    from geograypher_tpu.utils.geometric import serpentine_face_order

    verts, faces = make_grid_mesh(n=41, size=4.0)
    cent = verts[faces].mean(axis=1)[:, :2]
    order = serpentine_face_order(cent)
    assert sorted(order) == list(range(len(faces)))

    c = cent[order]
    bb = 8
    nb = len(c) // bb
    spans = (
        c[: nb * bb].reshape(nb, bb, 2).max(axis=1)
        - c[: nb * bb].reshape(nb, bb, 2).min(axis=1)
    )
    cell = 4.0 / 40
    # every 8-face block spans only a local neighborhood in BOTH axes;
    # plain scanline order would have ~40 blocks spanning the full 4.0
    # extent in x at row wraps
    assert spans[:, 0].max() < 8 * cell + 1e-9
    assert spans[:, 1].max() < 3 * cell + 1e-9


def test_partitioned_face_order_packs_giants():
    """Oversized faces (Delaunay hull slivers etc.) are packed into their
    own trailing id blocks; uniform meshes reduce to plain serpentine."""
    from geograypher_tpu.utils.fixtures import make_grid_mesh
    from geograypher_tpu.utils.geometric import (
        partitioned_face_order,
        serpentine_face_order,
    )

    verts, faces = make_grid_mesh(n=41, size=4.0)
    fv = verts[faces][..., :2]
    # uniform mesh: bit-identical to serpentine
    cent = fv.mean(axis=1)
    assert np.array_equal(
        partitioned_face_order(fv), serpentine_face_order(cent)
    )

    # graft 24 giant faces (vertex triples guaranteed to span >= half the
    # domain: slivers anchored at a random point, stretched 2.0 in x)
    rng = np.random.default_rng(0)
    nv = len(verts)
    anchor = rng.uniform(-2.0, 0.0, (24, 3))
    gv = np.stack(
        [anchor, anchor + [2.0, 0.0, 0.0], anchor + [2.0, 0.05, 0.0]],
        axis=1,
    ).reshape(24 * 3, 3)
    verts2 = np.concatenate([verts, gv], axis=0)
    gfaces = nv + np.arange(24 * 3).reshape(24, 3)
    # interleave the giants among normal faces (worst case for packing)
    all_faces = np.concatenate([faces, gfaces], axis=0)
    perm = rng.permutation(len(all_faces))
    all_faces = all_faces[perm]
    order = partitioned_face_order(verts2[all_faces][..., :2])
    assert sorted(order) == list(range(len(all_faces)))
    ordered = all_faces[order]
    # the giants are exactly the trailing 24 ids (3 full bin_block=8 units)
    is_giant = (ordered >= nv).all(axis=1)
    assert is_giant.sum() == 24
    assert is_giant[-24:].all()
    # and the leading faces remain spatially compact per 8-block
    c = verts2[ordered[:-24]][..., :2].mean(axis=1)
    bb = 8
    nb = len(c) // bb
    spans = (
        c[: nb * bb].reshape(nb, bb, 2).max(axis=1)
        - c[: nb * bb].reshape(nb, bb, 2).min(axis=1)
    )
    cell = 4.0 / 40
    assert spans[:, 0].max() < 8 * cell + 1e-9
