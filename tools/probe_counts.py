"""Attribute the fused count section's per-view cost.

Times the raster kernel chain (one view, own census caps) at
n_classes in {1, 4, 10, 20}: the winner-match compare (``m``) is
kp-independent, the one-hot count dot and the om buffer scale with kp —
the slope/intercept split says which to attack.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_counts.py
"""

import os
import sys
import time

import numpy as np


def sync(x):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8])))


def timeit(fn, *args, reps=6):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops.rasterize import (
        RasterConfig,
        bin_all,
        bin_triangles,
        fused_counts_pallas,
        setup_from_soa,
        tri_to_soa,
    )
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        oblique_camera,
    )
    from geograypher_tpu.utils.geometric import serpentine_face_order

    H, W = 2160, 3840
    bin_block = 8
    verts, faces = make_grid_mesh(
        n=708, size=4.0,
        z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y),
    )
    faces = faces[serpentine_face_order(verts[faces].mean(axis=1)[:, :2])]
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // bin_block) * bin_block
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    tri = jnp.asarray(tri_to_soa(tv))

    c2w = oblique_camera(4.0, 2600.0, W, pitch_deg=15.0, azimuth_deg=18.0)
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    flv = jnp.float32(2600.0)

    census_cfg = RasterConfig(
        caps=(8, 8, 8, 8), backend="pallas", bin_block=bin_block,
        l0_window=(5, 2),
    )

    @jax.jit
    def census(tri, w2c_k, f_k):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, census_cfg.znear)
        return bin_triangles(setup, census_cfg, H, W, return_census=True)

    lvl = np.asarray(census(tri, w2c, flv))
    caps = tuple(int(max(16, -(-int(c * 5 // 4) // 16) * 16)) for c in lvl)
    config = RasterConfig(
        caps=caps, backend="pallas", bin_block=bin_block, l0_window=(5, 2)
    )
    print(f"census {lvl.tolist()} -> caps {caps}")

    for n_classes in (1, 4, 10, 20):
        lab = jax.random.randint(
            jax.random.PRNGKey(7), (H, W), 0, n_classes, jnp.int32
        )

        @jax.jit
        def stage_counts(tri, w2c, flv, lab, config=config,
                         n_classes=n_classes):
            setup = setup_from_soa(tri, w2c, flv, W, H, config.znear)
            binned, sb = bin_all(setup, config, H, W)
            return fused_counts_pallas(
                setup, binned, sb, lab, config, H, W, n_classes
            )

        tc = timeit(stage_counts, tri, w2c, flv, lab)
        print(f"  n_classes={n_classes:2d}: {tc*1e3:7.2f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
