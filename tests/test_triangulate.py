"""Segment closest-point math: analytic cases (in the spirit of the
reference's hand-computed tables, tests/test_numeric.py), graph weights,
communities, ray casting."""

import numpy as np
import pytest

from geograypher_tpu.ops.raycast import clip_line_segments, ray_triangle_intersect
from geograypher_tpu.ops.triangulate import (
    calc_communities,
    calc_graph_weights,
    pairwise_segment_closest_points,
)
from geograypher_tpu.utils.numeric import intersection_average


def single_pair(a0, a1, b0, b1, clamp):
    pA, pB, d = pairwise_segment_closest_points(
        np.asarray([a0], float), np.asarray([a1], float),
        np.asarray([b0], float), np.asarray([b1], float), clamp=clamp,
    )
    return pA[0, 0], pB[0, 0], d[0, 0]


def test_crossing_segments():
    # X and Y axis segments crossing at the origin, separated by 1 in z
    pA, pB, d = single_pair(
        (-1, 0, 0), (1, 0, 0), (0, -1, 1), (0, 1, 1), clamp=True
    )
    assert np.allclose(pA, [0, 0, 0], atol=1e-5)
    assert np.allclose(pB, [0, 0, 1], atol=1e-5)
    assert np.isclose(d, 1.0, atol=1e-5)


def test_clamped_vs_unclamped():
    # Skew segments whose infinite-line closest points lie beyond the ends
    a0, a1 = (0, 0, 0), (1, 0, 0)
    b0, b1 = (2, 1, 1), (3, 1, 1)
    pA, pB, d_inf = single_pair(a0, a1, b0, b1, clamp=False)
    # infinite lines are parallel? no: both along x -> parallel case
    a0, a1 = (0, 0, 0), (1, 0, 0)
    b0, b1 = (2, 0, 1), (2, 1, 1)  # perpendicular, offset
    pA, pB, d = single_pair(a0, a1, b0, b1, clamp=True)
    # closest: end of A (1,0,0) vs start of B (2,0,1): dist sqrt(1+1)
    assert np.allclose(pA, [1, 0, 0], atol=1e-5)
    assert np.allclose(pB, [2, 0, 1], atol=1e-5)
    assert np.isclose(d, np.sqrt(2), atol=1e-5)
    _, _, d_nc = single_pair(a0, a1, b0, b1, clamp=False)
    # unclamped lines get closer (x=2 on A line, y=0 on B line -> dist 1)
    assert np.isclose(d_nc, 1.0, atol=1e-5)


def test_parallel_overlapping():
    a0, a1 = (0, 0, 0), (2, 0, 0)
    b0, b1 = (1, 1, 0), (3, 1, 0)
    pA, pB, d = single_pair(a0, a1, b0, b1, clamp=True)
    assert np.isclose(d, 1.0, atol=1e-5)
    # middle case: pA is b0 projected onto A
    assert np.allclose(pA, [1, 0, 0], atol=1e-5)
    assert np.allclose(pB, [1, 1, 0], atol=1e-5)


def test_parallel_before_after():
    a0, a1 = (0, 0, 0), (1, 0, 0)
    b0, b1 = (3, 1, 0), (4, 1, 0)  # entirely "after" A
    pA, pB, d = single_pair(a0, a1, b0, b1, clamp=True)
    assert np.allclose(pA, [1, 0, 0], atol=1e-5)
    assert np.allclose(pB, [3, 1, 0], atol=1e-5)
    assert np.isclose(d, np.sqrt(4 + 1), atol=1e-5)


def test_matrix_shape_and_symmetry():
    rng = np.random.default_rng(0)
    starts = rng.normal(size=(12, 3))
    ends = starts + rng.normal(size=(12, 3))
    pA, pB, d = pairwise_segment_closest_points(
        starts, ends, starts, ends, clamp=True
    )
    assert d.shape == (12, 12)
    assert np.allclose(np.diag(d), 0.0, atol=1e-4)
    assert np.allclose(d, d.T, atol=1e-3)


def test_intersection_average_converging_rays():
    # Rays from different directions all passing near one point
    target = np.array([1.0, 2.0, 3.0])
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(6, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    starts = target - dirs * 5.0
    ends = target + dirs * 5.0
    avg = intersection_average(starts, ends)
    assert np.allclose(avg, target, atol=1e-3)


def test_graph_weights_and_communities():
    # Two clusters of rays converging at two distinct points
    rng = np.random.default_rng(2)
    points = [np.array([0.0, 0.0, 5.0]), np.array([10.0, 0.0, 5.0])]
    starts, ends, ray_ids = [], [], []
    for ci, p in enumerate(points):
        for k in range(5):
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            starts.append(p - d * 8)
            ends.append(p + d * 8)
            ray_ids.append(k)  # each "image" sees both objects
    starts, ends = np.asarray(starts), np.asarray(ends)
    edges = calc_graph_weights(
        starts, ends, np.asarray(ray_ids), similarity_threshold=0.5, step=4
    )
    assert len(edges) > 0
    # no same-image edges
    for i, j, _ in edges:
        assert ray_ids[i] != ray_ids[j]
    result = calc_communities(starts, ends, edges, seed=0)
    pts = result["community_points"]
    assert pts.shape[0] == 2
    dists = np.linalg.norm(
        pts[:, None, :] - np.asarray(points)[None], axis=2
    )
    assert dists.min(axis=1).max() < 0.5


def test_ray_triangle_and_clipping():
    tri = np.array([[[-1, -1, 2.0], [3, -1, 2.0], [-1, 3, 2.0]]])
    t, face = ray_triangle_intersect(
        np.array([[0.0, 0, 0], [5.0, 5, 0]]),
        np.array([[0.0, 0, 1], [0.0, 0, 1]]),
        tri,
    )
    t, face = np.asarray(t), np.asarray(face)
    assert np.isclose(t[0], 2.0) and face[0] == 0
    assert np.isinf(t[1]) and face[1] == -1

    ceiling = np.array([[[-10, -10, 8.0], [30, -10, 8.0], [-10, 30, 8.0]]])
    floor = np.array([[[-10, -10, 1.0], [30, -10, 1.0], [-10, 30, 1.0]]])
    starts = np.array([[0.0, 0, 10.0]])
    ends = np.array([[0.0, 0, 0.0]])
    s2, e2, valid = clip_line_segments(starts, ends, ceiling, floor)
    assert valid[0]
    assert np.isclose(s2[0, 2], 8.0, atol=1e-4)
    assert np.isclose(e2[0, 2], 1.0, atol=1e-4)
