"""Fine-grained split of the raster kernel chain's per-view cost.

For one nadir and one oblique view, each at its OWN census caps (the
bucketed-bench regime), times four nested prefixes in separate jits:

    A. setup + binning
    B. A + slab prep (the XLA gather/relayout work feeding the kernel)
    C. A + raster kernel, pix2face only (no fused class counts)
    D. A + raster kernel with fused class counts (the bench path)

Differences attribute the chain: B-A = slab prep, C-B ~ z-resolve,
D-C ~ count-match section.  (Separate jits lose some fusion; treat
deltas as attribution, the bench as truth.)

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_kernel_split.py
"""

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

    from geograypher_tpu.ops.pallas_raster import (
        _prep_level_slab,
        raster_tiles_pallas,
    )
    from geograypher_tpu.ops.rasterize import (
        RasterConfig,
        bin_all,
        bin_triangles,
        fused_counts_pallas,
        l0_geometry,
        setup_from_soa,
        tri_to_soa,
    )
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        nadir_camera,
        oblique_camera,
    )

    import os

    from geograypher_tpu.utils.geometric import serpentine_face_order

    H, W = 2160, 3840
    n_classes = 10
    bin_block = int(os.environ.get("PROBE_BB", "8"))
    l0_group = int(os.environ.get("PROBE_L0G", "2"))
    print(f"bin_block={bin_block} l0_group={l0_group}")
    verts, faces = make_grid_mesh(
        n=708, size=4.0,
        z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y),
    )
    if os.environ.get("PROBE_ORDER", "serpentine") == "serpentine":
        faces = faces[serpentine_face_order(verts[faces].mean(axis=1)[:, :2])]
        print("order: serpentine")
    else:
        print("order: rowmajor")
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // bin_block) * bin_block
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    tri = jnp.asarray(tri_to_soa(tv))

    views = {
        "nadir": (nadir_camera(4.0, 2000.0, W), 2000.0),
        "oblique": (
            oblique_camera(4.0, 2600.0, W, pitch_deg=30.0, azimuth_deg=90.0),
            2600.0,
        ),
    }
    lab = jax.random.randint(
        jax.random.PRNGKey(7), (H, W), 0, n_classes, jnp.int32
    )

    census_cfg = RasterConfig(
        caps=(8, 8, 8, 8), backend="pallas", bin_block=bin_block,
        l0_window=(5, 2),
    )

    @jax.jit
    def census(tri, w2c_k, f_k):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, census_cfg.znear)
        return bin_triangles(setup, census_cfg, H, W, return_census=True)

    for name, (c2w, focal) in views.items():
        w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
        flv = jnp.float32(focal)
        lvl = np.asarray(census(tri, w2c, flv))
        caps = tuple(int(max(16, -(-int(c * 5 // 4) // 16) * 16)) for c in lvl)
        config = RasterConfig(
            caps=caps, backend="pallas", bin_block=bin_block,
            l0_window=(5, 2), l0_group=l0_group,
        )
        print(f"== {name}: census {lvl.tolist()} -> caps {caps}")

        @jax.jit
        def stage_bin(tri, w2c, flv, config=config):
            setup = setup_from_soa(tri, w2c, flv, W, H, config.znear)
            return bin_all(setup, config, H, W)

        @jax.jit
        def stage_slabs(tri, w2c, flv, config=config):
            setup = setup_from_soa(tri, w2c, flv, W, H, config.znear)
            binned, sb = bin_all(setup, config, H, W)
            planes = setup.planes
            bb = config.bin_block
            n_units = planes.shape[0] // bb
            sentinel = jnp.asarray(
                [0, 0, -1, 0, 0, -1, 0, 0, -1, 0, 0, 0], planes.dtype
            )
            planes_ext = jnp.concatenate(
                [
                    planes.T.reshape(12, n_units, bb)
                    .transpose(1, 0, 2)
                    .reshape(n_units, bb * 12),
                    jnp.repeat(sentinel, bb)[None],
                ],
                axis=0,
            )
            grids = config.grids(H, W)
            (nty0, ntx0), (nty1, ntx1), (nty2, ntx2) = grids
            pair, nty0p, ntx0p = l0_geometry(config, H, W)
            cand0 = binned.cand[0].reshape(nty0, ntx0, -1)
            if ntx0p != ntx0 or nty0p != nty0:
                cand0 = jnp.pad(
                    cand0,
                    ((0, nty0p - nty0), (0, ntx0p - ntx0), (0, 0)),
                    constant_values=-1,
                )
            cand0 = cand0.reshape(nty0p * ntx0p, -1)
            tids = jnp.arange(cand0.shape[0], dtype=jnp.int32)
            origin = (
                ((tids % ntx0p) * config.tile_w).astype(jnp.float32),
                ((tids // ntx0p) * config.tile_h).astype(jnp.float32),
            )
            cap2, cap3 = config.caps[2], config.caps[3]
            cand2m = jnp.concatenate(
                [
                    binned.cand[2],
                    jnp.broadcast_to(binned.cand[3], (nty2 * ntx2, cap3)),
                ],
                axis=1,
            )
            s0, c0 = _prep_level_slab(
                cand0, planes_ext, n_units, tile_origin=origin, block=bb
            )
            s1, c1 = _prep_level_slab(binned.cand[1], planes_ext, n_units, block=bb)
            s2, c2 = _prep_level_slab(cand2m, planes_ext, n_units, block=bb)
            return s0, s1, s2

        @jax.jit
        def stage_raster(tri, w2c, flv, config=config):
            setup = setup_from_soa(tri, w2c, flv, W, H, config.znear)
            binned, sb = bin_all(setup, config, H, W)
            return raster_tiles_pallas(binned, setup.planes, config, H, W)

        @jax.jit
        def stage_counts(tri, w2c, flv, lab, config=config):
            setup = setup_from_soa(tri, w2c, flv, W, H, config.znear)
            binned, sb = bin_all(setup, config, H, W)
            return fused_counts_pallas(
                setup, binned, sb, lab, config, H, W, n_classes
            )

        tb = timeit(stage_bin, tri, w2c, flv)
        ts = timeit(stage_slabs, tri, w2c, flv)
        tr = timeit(stage_raster, tri, w2c, flv)
        tc = timeit(stage_counts, tri, w2c, flv, lab)
        print(
            f"  A setup+bin        {tb*1e3:7.2f} ms\n"
            f"  B +slab prep       {ts*1e3:7.2f} ms   (slab {1e3*(ts-tb):6.2f})\n"
            f"  C +raster (p2f)    {tr*1e3:7.2f} ms   (resolve {1e3*(tr-ts):6.2f})\n"
            f"  D +fused counts    {tc*1e3:7.2f} ms   (count sec {1e3*(tc-tr):6.2f})"
        )


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
