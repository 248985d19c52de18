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
