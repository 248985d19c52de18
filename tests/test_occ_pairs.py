"""Occupied-pair grid compaction (RasterConfig.occ_pairs).

The compacted kernel grid must be bit-identical to the dense grid —
pix2face AND fused class counts — and undersizing the pair cap must
surface as overflow, never silent drops.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geograypher_tpu.ops.agg_tiled import fold_tile_counts
from geograypher_tpu.ops.pallas_raster import raster_tiles_pallas
from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    bin_all,
    fused_counts_pallas,
    setup_from_soa,
    tri_to_soa,
)
from geograypher_tpu.utils.fixtures import (
    gather_tri_verts,
    make_grid_mesh,
    nadir_camera,
    oblique_camera,
)

H, W = 96, 256
N_CLASSES = 5
BASE = RasterConfig(
    caps=(32, 16, 16, 16), backend="pallas", bin_block=8, l0_window=(5, 2)
)


@pytest.fixture(scope="module")
def scene():
    verts, faces = make_grid_mesh(
        n=21, size=4.0, z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y)
    )
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // 8) * 8
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    tri = jnp.asarray(tri_to_soa(tv))
    lab = jax.random.randint(
        jax.random.PRNGKey(3), (H, W), 0, N_CLASSES, jnp.int32
    )
    return tri, f_pad, lab


def _chain(cfg, f_pad):
    @jax.jit
    def chain(tri, w2c, fl, lab):
        setup = setup_from_soa(tri, w2c, fl, W, H, cfg.znear)
        binned, sb = bin_all(setup, cfg, H, W)
        outs = fused_counts_pallas(setup, binned, sb, lab, cfg, H, W,
                                   N_CLASSES)
        counts, over = fold_tile_counts(
            outs, binned, cfg, H, W, f_pad, N_CLASSES,
            w_cap=504, block=4096, return_overflow=True,
        )
        p2f = raster_tiles_pallas(binned, setup.planes, cfg, H, W)
        n_occ = (
            jnp.sum(binned.occ_mask.astype(jnp.int32))
            if binned.occ_mask is not None
            else jnp.int32(-1)
        )
        return counts, over + binned.overflow, p2f, n_occ

    return chain


@pytest.mark.parametrize("view", ["nadir", "oblique"])
def test_occ_equals_dense(scene, view):
    tri, f_pad, lab = scene
    if view == "nadir":
        c2w, fl = nadir_camera(4.0, 100.0, W), 100.0
    else:
        c2w, fl = (
            oblique_camera(4.0, 130.0, W, pitch_deg=32.0, azimuth_deg=120.0),
            130.0,
        )
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    occ_cfg = dataclasses.replace(BASE, occ_pairs=512)
    cd, od, pd, _ = _chain(BASE, f_pad)(tri, w2c, jnp.float32(fl), lab)
    co, oo, po, n_occ = _chain(occ_cfg, f_pad)(
        tri, w2c, jnp.float32(fl), lab
    )
    assert int(oo) == 0 and int(od) == 0
    # some pairs must actually be skipped for the test to mean anything
    assert 0 < int(n_occ) <= 512
    assert np.array_equal(np.asarray(pd), np.asarray(po))
    assert np.array_equal(np.asarray(cd), np.asarray(co))


def test_occ_undersized_overflows(scene):
    tri, f_pad, lab = scene
    c2w = nadir_camera(4.0, 100.0, W)
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    tiny = dataclasses.replace(BASE, occ_pairs=8)
    _c, over, _p, n_occ = _chain(tiny, f_pad)(
        tri, w2c, jnp.float32(100.0), lab
    )
    assert int(n_occ) > 8
    assert int(over) == int(n_occ) - 8
