"""Exact vector geometry: mesh-native class boundaries + convex overlay."""

import numpy as np

from geograypher_tpu.utils.exact_geometry import (
    class_region_polygons,
    clip_areas_convex,
    ear_clip,
    polygon_overlay_areas,
)
from geograypher_tpu.utils.fixtures import make_grid_mesh
from geograypher_tpu.utils.vector import Polygon, _ring_area


def _tri_area_sum(verts2d, faces, mask):
    t = verts2d[faces[mask]]
    a = 0.5 * np.abs(
        (t[:, 1, 0] - t[:, 0, 0]) * (t[:, 2, 1] - t[:, 0, 1])
        - (t[:, 2, 0] - t[:, 0, 0]) * (t[:, 1, 1] - t[:, 0, 1])
    )
    return a.sum()


def _grid_labels(n, size, box):
    """Labels: class 1 inside the (x0, y0, x1, y1) box of face centroids."""
    verts, faces = make_grid_mesh(n=n, size=size)
    v2 = verts[:, :2]
    cent = v2[faces].mean(axis=1)
    x0, y0, x1, y1 = box
    lab = np.where(
        (cent[:, 0] > x0) & (cent[:, 0] < x1)
        & (cent[:, 1] > y0) & (cent[:, 1] < y1),
        1.0,
        0.0,
    )
    return verts, faces, v2, lab


def test_rectangle_region_exact():
    verts, faces, v2, lab = _grid_labels(21, 4.0, (-1.0, -1.0, 1.0, 1.0))
    regions = class_region_polygons(v2, faces, lab)
    assert set(regions) == {0, 1}
    polys1 = regions[1]
    assert len(polys1) == 1
    p = polys1[0]
    # area matches the summed face areas EXACTLY (same vertices, shoelace
    # of a region partitioned by its own triangles)
    want = _tri_area_sum(v2, faces, lab == 1)
    assert abs(p.area - want) < 1e-9 * max(want, 1)
    # boundary vertices are exact mesh vertices on the box edge
    grid_pts = {tuple(np.round(q, 9)) for q in v2}
    for q in p.exterior:
        assert tuple(np.round(q, 9)) in grid_pts
    # class 0 is the complement: one polygon with one hole
    polys0 = regions[0]
    assert len(polys0) == 1 and len(polys0[0].holes) == 1
    want0 = _tri_area_sum(v2, faces, lab == 0)
    assert abs(polys0[0].area - want0) < 1e-9 * want0


def test_sub_resolution_strip_survives():
    """A one-face-row strip far narrower than any raster resolution is
    preserved exactly (the raster-assisted path quantizes such features
    away — reference parity is exact GEOS, utils/geometric.py:13)."""
    n, size = 41, 4.0
    step = size / (n - 1)
    verts, faces, v2, _ = _grid_labels(n, size, (0, 0, 1, 1))
    cent = v2[faces].mean(axis=1)
    lab = np.where(
        (cent[:, 1] > 0) & (cent[:, 1] < step) & (np.abs(cent[:, 0]) < 1.0),
        1.0,
        0.0,
    )
    regions = class_region_polygons(v2, faces, lab)
    strip = regions[1]
    assert len(strip) == 1
    want = _tri_area_sum(v2, faces, lab == 1)
    assert want > 0
    assert abs(strip[0].area - want) < 1e-9 * want


def test_ear_clip_partitions_area():
    # non-convex "L" + a star-ish ring
    rings = [
        np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3]], float),
        np.array(
            [[0, 0], [2, 1], [4, 0], [3, 2], [4, 4], [2, 3], [0, 4], [1, 2]],
            float,
        ),
    ]
    for ring in rings:
        tris = ear_clip(ring)
        got = sum(abs(_ring_area(t)) for t in tris)
        assert abs(got - abs(_ring_area(ring))) < 1e-9
        assert tris.shape[0] == ring.shape[0] - 2


def test_clip_areas_convex_cases():
    t = np.array([[0, 0], [2, 0], [0, 2]], float)
    subjects = np.stack(
        [
            t,  # identical
            t + 10.0,  # disjoint
            np.array([[0, 0], [1, 0], [0, 1]]),  # contained
            np.array([[1, 1], [3, 1], [1, 3]]),  # corner overlap
        ]
    )
    areas = clip_areas_convex(subjects, t)
    np.testing.assert_allclose(areas[0], 2.0, atol=1e-12)
    np.testing.assert_allclose(areas[1], 0.0, atol=1e-12)
    np.testing.assert_allclose(areas[2], 0.5, atol=1e-12)
    # corner triangle ∩ t: region x>=1, y>=1, x+y<=2 is empty
    np.testing.assert_allclose(areas[3], 0.0, atol=1e-12)
    t2 = np.array([[1, 0], [3, 0], [1, 2]], float)
    a2 = clip_areas_convex(t[None], t2)
    # overlap of the two right triangles: x in [1, 2], below both
    # hypotenuses -> triangle (1,0),(2,0),(1,1)
    np.testing.assert_allclose(a2[0], 0.5, atol=1e-12)


def test_polygon_overlay_partition():
    """Mesh faces partition the plane, so overlay areas against any
    polygon must sum exactly to the polygon area (inside the mesh)."""
    verts, faces = make_grid_mesh(n=11, size=4.0)
    tris = verts[:, :2][faces]
    rng = np.random.default_rng(0)
    ring = np.array(
        [[-1.3, -0.7], [0.9, -1.1], [1.4, 0.2], [0.1, 1.3], [-0.8, 0.6]]
    )
    hole = np.array([[-0.2, -0.2], [0.3, -0.2], [0.3, 0.3], [-0.2, 0.3]])
    poly = Polygon(ring, [hole])
    areas = polygon_overlay_areas(tris, poly)
    assert abs(areas.sum() - poly.area) < 1e-9
    # a face fully inside contributes its full area
    cent = tris.mean(axis=1)
    inside = poly.contains_points(cent)
    full = np.nonzero(inside & (areas > 0))[0]
    assert full.size > 10


def test_polygon_intersection_area():
    from geograypher_tpu.utils.exact_geometry import (
        polygon_intersection_area,
    )

    sq = lambda x0, y0, w: Polygon(
        np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w]])
    )
    a = sq(0, 0, 2)
    assert abs(polygon_intersection_area(a, sq(1, 1, 2)) - 1.0) < 1e-12
    assert polygon_intersection_area(a, sq(5, 5, 1)) == 0.0
    holey = Polygon(a.exterior, [sq(0.5, 0.5, 1).exterior])
    # holey ∩ big square = 4 - 1 = 3
    assert abs(polygon_intersection_area(holey, sq(-1, -1, 5)) - 3.0) < 1e-12
    # and intersection with a square inside the hole is empty
    assert abs(polygon_intersection_area(holey, sq(0.6, 0.6, 0.5))) < 1e-12


def test_cf_vector_vector_exact_matches_analytic():
    from geograypher_tpu.utils.prediction_metrics import (
        cf_from_vector_vector,
    )
    from geograypher_tpu.utils.vector import VectorData

    sq = lambda x0, y0, w: Polygon(
        np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w]])
    )
    true = VectorData([sq(0, 0, 2)], {"cls": ["a"]})
    pred = VectorData(
        [sq(0, 0, 1), sq(1, 0, 2)], {"cls": ["a", "b"]}
    )
    cf, names = cf_from_vector_vector(pred, true, "cls", mode="exact")
    assert names == ["a", "b"]
    # true 'a' (area 4): 1 with pred-a, 2 with pred-b, 1 uncovered
    np.testing.assert_allclose(cf[0, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(cf[0, 1], 2.0, atol=1e-12)
    np.testing.assert_allclose(cf[0, 2], 1.0, atol=1e-12)
    # pred-b (area 4) extends 2 area units beyond true -> unlabeled row
    np.testing.assert_allclose(cf[2, 1], 2.0, atol=1e-12)


def test_pinch_vertex_rings_stay_separate():
    """Two same-class triangles sharing exactly one vertex must come back
    as TWO simple polygons, even when the ring trace reaches the pinch
    vertex with the (used) closing seed edge as the geometrically
    correct continuation — the figure-eight merge regression."""
    from geograypher_tpu.utils.exact_geometry import class_region_polygons

    verts2d = np.array(
        [
            [9.0, 9.0],  # 0: unused filler
            [1.0, 1.0],  # 1: the pinch vertex P
            [9.0, 8.0],  # 2: unused filler
            [2.0, 0.0],  # 3
            [2.0, 2.0],  # 4
            [0.0, 2.0],  # 5
            [0.0, 0.0],  # 6
        ]
    )
    # face0's FIRST directed edge starts at P, so the trace returns to P
    # with the seed edge used while face1 still has an unused out-edge
    faces = np.array([[1, 5, 6], [1, 3, 4]])
    labels = np.array([1.0, 1.0])
    out = class_region_polygons(verts2d, faces, labels)
    polys = out[1]
    assert len(polys) == 2, [p.exterior for p in polys]
    areas = sorted(round(p.area, 6) for p in polys)
    assert areas == [1.0, 1.0]
    for p in polys:
        # simple triangle rings, each visiting P exactly once
        assert p.exterior.shape[0] == 3
