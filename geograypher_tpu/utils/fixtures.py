"""Synthetic analytic test fixtures.

Re-creation of the reference's fixture ideas (utils/test_utils.py:10-156,
utils/example_data.py:29-111): a flat grid mesh whose cells align exactly
with the pixels of a nadir camera, giving closed-form pixel<->face answers;
plus a simple procedural scene generator for end-to-end tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_grid_mesh(
    n: int = 201,
    size: float = 4.0,
    z_fn=None,
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Regular (n x n)-vertex triangulated plane centered at the origin.

    Vertices are laid out row-major over (y, x): vertex (iy, ix) sits at
    ``(-size/2 + ix*step, -size/2 + iy*step, z_fn(x, y))``.  Each grid cell
    splits into two triangles: A = (v00, v10, v11), B = (v00, v11, v01),
    where v10 is +x and v01 is +y of v00.

    Returns (verts (V, 3) float64, faces (F, 3) int32).
    """
    step = size / (n - 1)
    coords = -size / 2 + step * np.arange(n)
    xx, yy = np.meshgrid(coords, coords, indexing="xy")  # (n, n): [iy, ix]
    zz = np.zeros_like(xx) if z_fn is None else z_fn(xx, yy)
    verts = np.stack(
        [xx.ravel() + offset[0], yy.ravel() + offset[1], zz.ravel() + offset[2]],
        axis=1,
    )
    iy, ix = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    v00 = (iy * n + ix).ravel()
    v10 = v00 + 1
    v01 = v00 + n
    v11 = v01 + 1
    tri_a = np.stack([v00, v10, v11], axis=1)
    tri_b = np.stack([v00, v11, v01], axis=1)
    faces = np.concatenate([tri_a, tri_b], axis=1).reshape(-1, 3)
    return verts, faces.astype(np.int32)


def make_irregular_mesh(
    n_points: int = 2000,
    size: float = 4.0,
    z_fn=None,
    seed: int = 0,
    jitter: float = 0.45,
    extra_frac: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Irregular Delaunay TIN over jittered grid points plus uniform extras.

    Models what photogrammetry software exports (arbitrary Metashape TINs,
    reference meshes.py:157-229): no scanline structure, irregular vertex
    valence, and locally varying density — the adversarial counterpart of
    :func:`make_grid_mesh` for face-ordering benchmarks.  ``jitter`` is
    the per-point displacement in units of the grid step; ``extra_frac``
    adds that fraction of extra uniformly-random points (density
    variation).  Triangles are oriented consistently (counter-clockwise
    in xy, like the grid mesh's upward normals).

    Returns (verts (V, 3) float64, faces (F, 3) int32), F ~= 2 * n_points.
    """
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    n_grid = max(int(np.sqrt(n_points / (1.0 + extra_frac))), 2)
    step = size / (n_grid - 1)
    coords = -size / 2 + step * np.arange(n_grid)
    xx, yy = np.meshgrid(coords, coords, indexing="xy")
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
    pts = pts + rng.uniform(-jitter * step, jitter * step, pts.shape)
    n_extra = int(extra_frac * pts.shape[0])
    if n_extra:
        extra = rng.uniform(-size / 2, size / 2, (n_extra, 2))
        pts = np.concatenate([pts, extra], axis=0)
    tri = Delaunay(pts)
    faces = tri.simplices.astype(np.int32)
    # enforce CCW orientation in xy (Delaunay does not guarantee it)
    a, b, c = pts[faces[:, 0]], pts[faces[:, 1]], pts[faces[:, 2]]
    det = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    flip = det < 0
    faces[flip] = faces[flip][:, ::-1]
    zz = np.zeros(pts.shape[0]) if z_fn is None else z_fn(pts[:, 0], pts[:, 1])
    verts = np.concatenate([pts, zz[:, None]], axis=1)
    return verts, faces


def oblique_camera(
    scene_width: float = 4.0,
    focal: float = 100.0,
    sensor_width: int = 200,
    pitch_deg: float = 25.0,
    azimuth_deg: float = 0.0,
) -> np.ndarray:
    """cam-to-world of a camera tilted ``pitch_deg`` off nadir, orbited
    ``azimuth_deg`` about the scene center, at the same triangle-ratio
    distance as :func:`nadir_camera` (x right, y down, z = view).

    Exercises the off-nadir capture geometry real drone surveys mix with
    nadir passes (reference cameras.py:244-326 measures these angles).
    """
    d = scene_width * focal / sensor_width
    pitch = np.deg2rad(pitch_deg)
    az = np.deg2rad(azimuth_deg)
    eye = d * np.array(
        [np.sin(pitch) * np.cos(az), np.sin(pitch) * np.sin(az), np.cos(pitch)]
    )
    z_cam = -eye / np.linalg.norm(eye)  # look at the scene center
    x_cam = np.cross(z_cam, np.array([0.0, 0.0, 1.0]))
    n = np.linalg.norm(x_cam)
    if n < 1e-9:  # nadir fallback
        x_cam = np.array([1.0, 0.0, 0.0])
    else:
        x_cam = x_cam / n
    y_cam = np.cross(z_cam, x_cam)  # right-handed, points downward
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_cam, y_cam, z_cam, eye
    return c2w


def nadir_camera(
    scene_width: float = 4.0, focal: float = 100.0, sensor_width: int = 200
) -> np.ndarray:
    """cam-to-world of a camera looking straight down at the origin from the
    triangle-ratio distance, so ``scene_width`` spans the full sensor
    (geometry of reference test_utils.py:42-67, re-derived).

    The camera's +Z (view direction) maps to world -Z and image up (-Y cam)
    maps to world +Y.
    """
    height = scene_width * focal / sensor_width
    return np.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, height],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def gather_tri_verts(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Pre-gathered (F, 3, 3) triangle vertices (the rasterizer's mesh
    representation: gather once per mesh, never per view)."""
    return np.asarray(verts)[np.asarray(faces)]


def brute_force_pix2face(
    tri_verts_cam: np.ndarray,
    f: float,
    image_w: int,
    image_h: int,
    znear: float = 1e-6,
) -> np.ndarray:
    """Independent O(pixels x faces) numpy reference rasterizer.

    Same mathematical definition as ops.rasterize (inclusive edge tests on
    pixel centers, both windings, perspective-correct 1/z depth, ties to the
    lowest face id) implemented with different code, used as the test
    oracle.
    """
    tri = np.asarray(tri_verts_cam, dtype=np.float64)
    z = tri[..., 2]
    valid = np.all(z > znear, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        sx = f * tri[..., 0] / z + image_w / 2.0
        sy = f * tri[..., 1] / z + image_h / 2.0
        w = 1.0 / z

    cols = np.arange(image_w) + 0.5
    rows = np.arange(image_h) + 0.5
    px, py = np.meshgrid(cols, rows, indexing="xy")

    best_w = np.full((image_h, image_w), -np.inf)
    best_face = np.full((image_h, image_w), -1, dtype=np.int32)
    for fid in range(tri.shape[0]):
        if not valid[fid]:
            continue
        x0, x1, x2 = sx[fid]
        y0, y1, y2 = sy[fid]
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        if abs(area2) <= 1e-12:
            continue
        s = np.sign(area2)
        covered = (s * e0 >= 0) & (s * e1 >= 0) & (s * e2 >= 0)
        lam0 = s * e0 / abs(area2)
        lam1 = s * e1 / abs(area2)
        lam2 = s * e2 / abs(area2)
        wpix = lam0 * w[fid, 0] + lam1 * w[fid, 1] + lam2 * w[fid, 2]
        upd = covered & (wpix > best_w)
        best_w[upd] = wpix[upd]
        best_face[upd] = fid
    return best_face


def make_scene_mesh(
    n_objects: int = 4, ground_n: int = 25, size: float = 20.0, seed: int = 0
):
    """Procedural scene: a ground plane plus boxes at random locations, with
    per-face integer class labels (ground=0, boxes=1..).

    Simplified analog of the reference's ``create_scene_mesh``
    (utils/example_data.py:29-111) used for end-to-end workflow tests.

    Returns (verts (V, 3), faces (F, 3), face_labels (F,),
    object_centers) where each center is (cx, cy, height, half) —
    ``half`` is the box's true half-extent (its footprint is the
    2*half x 2*half square), so ground-truth polygons can be exact.
    """
    rng = np.random.default_rng(seed)
    verts, faces = make_grid_mesh(n=ground_n, size=size)
    labels = [np.zeros((faces.shape[0],), dtype=np.int32)]
    all_verts = [verts]
    all_faces = [faces]
    centers = []
    v_off = verts.shape[0]
    for k in range(n_objects):
        cx_, cy_ = rng.uniform(-size / 3, size / 3, 2)
        half = rng.uniform(0.5, 1.5)
        height = rng.uniform(1.0, 3.0)
        bx, bf = _box_mesh((cx_, cy_, 0.0), half, height)
        all_verts.append(bx)
        all_faces.append(bf + v_off)
        labels.append(np.full((bf.shape[0],), k + 1, dtype=np.int32))
        centers.append((cx_, cy_, height, half))
        v_off += bx.shape[0]
    return (
        np.concatenate(all_verts, axis=0),
        np.concatenate(all_faces, axis=0).astype(np.int32),
        np.concatenate(labels, axis=0),
        np.array(centers),
    )


def _box_mesh(center, half: float, height: float):
    cx, cy, z0 = center
    x0, x1 = cx - half, cx + half
    y0, y1 = cy - half, cy + half
    z1 = z0 + height
    verts = np.array(
        [
            [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
            [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
        ]
    )
    quads = [
        (4, 5, 6, 7),  # top
        (0, 1, 5, 4),  # sides
        (1, 2, 6, 5),
        (2, 3, 7, 6),
        (3, 0, 4, 7),
    ]
    faces = []
    for (a, b, c, d) in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    return verts, np.array(faces, dtype=np.int32)
