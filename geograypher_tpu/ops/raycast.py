"""Ray/triangle intersection (replaces Embree for covering-mesh clipping).

The reference uses pyembree through pyvista's ``multi_ray_trace`` to clip
detection rays between ceiling/floor "covering meshes"
(utils/geometric.py:144-254).  Covering meshes are small (N x N grids,
reference meshes.py:2366-2447), so a dense batched Moller-Trumbore over all
(ray, triangle) pairs on the TPU beats building a BVH.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-9  # near-zero determinant / ray-parameter guard
# barycentric slack must be f32-scale: 1e-9 is below the f32 ulp at ~1,
# so rays grazing shared grid edges would miss BOTH adjacent triangles
# (Embree's watertight traversal keeps them); 1e-6 admits the shared
# edge on at least one side
BARY_EPS = 1e-6


@jax.jit
def ray_triangle_intersect(
    origins: jax.Array,
    directions: jax.Array,
    tri_verts: jax.Array,
):
    """First-hit parametric distance of rays against a triangle soup.

    Moller-Trumbore, dense over (R rays x F triangles), both windings.

    Args:
        origins: (R, 3) ray origins.
        directions: (R, 3) ray directions (not necessarily unit).
        tri_verts: (F, 3, 3) triangles.

    Returns:
        t_hit: (R,) smallest positive ray parameter, +inf if no hit.
        face: (R,) int32 face id of the first hit, -1 if none.
    """
    v0 = tri_verts[:, 0]  # (F, 3)
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0

    d = directions[:, None, :]  # (R, 1, 3)
    h = jnp.cross(d, e2[None, :, :])  # (R, F, 3)
    a = jnp.sum(e1[None] * h, axis=-1)  # (R, F)
    parallel = jnp.abs(a) < EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = origins[:, None, :] - v0[None]  # (R, F, 3)
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2[None] * q, axis=-1)
    hit = (
        ~parallel
        & (u >= -BARY_EPS)
        & (v >= -BARY_EPS)
        & (u + v <= 1.0 + BARY_EPS)
        & (t > EPS)
    )
    t = jnp.where(hit, t, jnp.inf)
    t_hit = jnp.min(t, axis=1)
    face = jnp.where(
        jnp.isfinite(t_hit), jnp.argmin(t, axis=1).astype(jnp.int32), -1
    )
    return t_hit, face


def clip_line_segments(
    starts,
    ends,
    ceiling_tris,
    floor_tris,
):
    """Clip segments to the volume between ceiling and floor surfaces.

    Port of the reference's Embree-based ``clip_line_segments``
    (utils/geometric.py:144-254): each ray starts where it crosses the
    ceiling and ends where it crosses the floor; rays missing either
    surface are dropped.

    Returns (clipped_starts, clipped_ends, valid_mask) as numpy arrays.
    """
    import numpy as np

    starts = jnp.asarray(starts, jnp.float32)
    ends = jnp.asarray(ends, jnp.float32)
    dirs = ends - starts
    t_ceil, _ = ray_triangle_intersect(starts, dirs, jnp.asarray(ceiling_tris, jnp.float32))
    t_floor, _ = ray_triangle_intersect(starts, dirs, jnp.asarray(floor_tris, jnp.float32))
    valid = jnp.isfinite(t_ceil) & jnp.isfinite(t_floor) & (t_floor > t_ceil)
    new_starts = starts + t_ceil[:, None] * dirs
    new_ends = starts + t_floor[:, None] * dirs
    return (
        np.asarray(new_starts),
        np.asarray(new_ends),
        np.asarray(valid),
    )
