"""Attribute the grouped-step cost OUTSIDE the raster kernel chain.

Round-4 measured the oblique bucket at ~91-117 ms/view while its kernel
chain (setup+binning+slab+raster+counts) probes at ~58 — the remaining
~33-50 ms/view is "glue": per-view entry compaction, the cross-view
entry concat, fold-window build + permutation, the fold kernels, and the
accumulator add.  This probe times nested prefixes of the REAL grouped
program (each stage jit returns its big outputs plus a tiny checksum so
XLA cannot dead-code the work; sync fetches only the checksum):

    K    g x (setup + binning + fused raster/count kernels)   [om, cand]
    PL   K + per-view per-level entry compaction              [entries]
    CC   PL + per-level cross-view concat + window build
         + the fold's permutation takes                       [operands]
    FULL the production group step (fold kernels + acc add)

Deltas: PL-K = compaction gathers, CC-PL = concat+windows+permutation,
FULL-CC = fold kernels + accumulator.  (Separate jits lose some fusion;
treat deltas as attribution, the bench as truth.)

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fold_glue.py \
        [--views 5] [--oblique-only] [--scale 1.0]
"""

import argparse
import sys
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(np.asarray(x if getattr(x, "ndim", 1) == 0 else jnp.sum(x)))


def timeit(fn, *args, reps=4):
    fn(*args)  # compile
    sync(fn(*args)[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[-1])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--nadir", action="store_true",
                    help="probe the nadir bucket instead of oblique")
    ap.add_argument("--fold-block", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops import agg_tiled
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
        nadir_camera,
        oblique_camera,
    )
    from geograypher_tpu.utils.geometric import partitioned_face_order

    H, W = int(2160 * args.scale), int(3840 * args.scale)
    n_grid = 708
    focal = 2000.0 * args.scale
    g = args.views
    n_classes = 10
    bb = 8

    verts, faces = make_grid_mesh(
        n=n_grid, size=4.0,
        z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y),
    )
    faces = faces[partitioned_face_order(verts[faces][..., :2])]
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // bb) * bb
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    tri = jnp.asarray(tri_to_soa(tv))

    rng = np.random.default_rng(0)
    w2cs = []
    for k in range(g):
        if args.nadir:
            c2w = nadir_camera(4.0, focal, W)
            c2w[0, 3] += rng.uniform(-0.3, 0.3)
        else:
            c2w = oblique_camera(
                4.0, focal, W, pitch_deg=float(rng.uniform(25.0, 35.0)),
                azimuth_deg=float(360.0 * k / max(g, 1)),
            )
        w2cs.append(np.linalg.inv(c2w))
    w2c = jnp.asarray(np.stack(w2cs), jnp.float32)
    labels = jax.random.randint(
        jax.random.PRNGKey(7), (g, H, W), 0, n_classes, jnp.int8
    )

    census_cfg = RasterConfig(
        caps=(8, 8, 8, 8), backend="pallas", bin_block=bb, l0_window=(5, 2),
    )

    @jax.jit
    def census(tri, w2c_k):
        setup = setup_from_soa(
            tri, w2c_k, jnp.float32(focal), W, H, census_cfg.znear
        )
        return bin_triangles(setup, census_cfg, H, W, return_census=True)

    worst = np.zeros(4, np.int64)
    for k in range(g):
        worst = np.maximum(worst, np.asarray(census(tri, w2c[k])))
    caps = tuple(int(max(16, -(-int(c * 5 // 4) // 16) * 16)) for c in worst)
    config = RasterConfig(
        caps=caps, backend="pallas", bin_block=bb, l0_window=(5, 2),
        fold_block=args.fold_block,
    )

    @jax.jit
    def stats(tri, w2c_k):
        setup = setup_from_soa(
            tri, w2c_k, jnp.float32(focal), W, H, config.znear
        )
        binned, _sb = bin_all(setup, config, H, W)
        wins = agg_tiled.level_fold_windows(
            binned, config, H, W, n_faces
        )
        return wins, agg_tiled.entry_occupancy(binned, config, H, W)

    max_win = np.zeros(4, np.int64)
    worst_entries = np.zeros(3, np.int64)
    for k in range(g):
        wins, occ = stats(tri, w2c[k])
        max_win = np.maximum(max_win, np.asarray(wins))
        worst_entries = np.maximum(worst_entries, np.asarray(occ))
    entry_caps = tuple(
        int(8 * (-(-int(v * 5 // 4) // 8))) for v in worst_entries
    )
    config = dataclasses_replace(config, entry_caps=entry_caps)
    from geograypher_tpu.parallel.planner import _group_w_cap

    w_cap = _group_w_cap(g, tuple(max_win), 1.25, entry_caps=entry_caps)
    print(
        f"caps={caps} entry_caps={entry_caps} w_cap={w_cap} g={g} "
        f"{'nadir' if args.nadir else 'oblique'}", file=sys.stderr,
    )

    # ---- nested-prefix stage jits ----------------------------------------
    def view_chain(tri, w2c_k, lab):
        setup = setup_from_soa(
            tri, w2c_k, jnp.float32(focal), W, H, config.znear
        )
        binned, sb = bin_all(setup, config, H, W)
        outs = fused_counts_pallas(
            setup, binned, sb, lab, config, H, W, n_classes
        )
        return outs, binned

    @jax.jit
    def stage_k(tri, w2c_g, labels_g):
        views = [view_chain(tri, w2c_g[k], labels_g[k]) for k in range(g)]
        cks = sum(
            jnp.sum(outs[0].ravel()[:128]) for outs, _b in views
        )
        return views, cks

    @jax.jit
    def stage_pl(tri, w2c_g, labels_g):
        views = [view_chain(tri, w2c_g[k], labels_g[k]) for k in range(g)]
        per_level = [
            agg_tiled._per_level_entries(outs, binned, config, H, W)
            for outs, binned in views
        ]
        cks = sum(
            jnp.sum(lv[0].ravel()[:128]) + jnp.sum(lv[1].ravel()[:128])
            for v in per_level for lv in v
        )
        return per_level, cks

    @jax.jit
    def stage_cc(tri, w2c_g, labels_g):
        views = [view_chain(tri, w2c_g[k], labels_g[k]) for k in range(g)]
        per_level = [
            agg_tiled._per_level_entries(outs, binned, config, H, W)
            for outs, binned in views
        ]
        w_caps = agg_tiled._level_w_caps(w_cap, len(per_level[0]))
        outs_all = []
        cks = jnp.zeros((), jnp.float32)
        for lvl in range(len(per_level[0])):
            counts = jnp.concatenate([v[lvl][0] for v in per_level], axis=0)
            ids = jnp.concatenate([v[lvl][1] for v in per_level], axis=0)
            t = counts.shape[0]
            valid = ids >= 0
            tmin = jnp.min(
                jnp.where(valid, ids, agg_tiled._BIG), axis=1
            ).astype(jnp.int32)
            tmax = jnp.max(jnp.where(valid, ids, -1), axis=1).astype(
                jnp.int32
            )
            nb = agg_tiled._round_up(n_faces, args.fold_block) // (
                args.fold_block
            )
            wc = min(
                agg_tiled._round_up(max(w_caps[lvl], 1), 8),
                agg_tiled._round_up(max(t, 8), 8),
            )
            win = agg_tiled._block_windows(
                tmin, tmax, nb, args.fold_block, wc
            )
            kb = agg_tiled._KB_U
            pad_n = agg_tiled._round_up(wc, kb) + kb
            order_p = jnp.concatenate(
                [win.order, jnp.full((pad_n,), t, jnp.int32)]
            )
            counts_p = jnp.take(counts, order_p, axis=0, mode="clip")
            ids_p = jnp.take(ids, order_p, axis=0, mode="fill",
                             fill_value=-1)
            outs_all.append((counts_p, ids_p))
            cks = cks + jnp.sum(counts_p.ravel()[:128]) + jnp.sum(
                ids_p.ravel()[:128].astype(jnp.float32)
            )
        return outs_all, cks

    @jax.jit
    def stage_full(tri, w2c_g, labels_g, acc):
        views = [view_chain(tri, w2c_g[k], labels_g[k]) for k in range(g)]
        counts, over = agg_tiled.fold_tile_counts_grouped(
            views, config, H, W, n_faces, n_classes,
            w_cap=w_cap, block=args.fold_block, return_overflow=True,
        )
        acc = acc + counts
        return acc, jnp.sum(acc.ravel()[:128]) + over.astype(jnp.float32)

    tk = timeit(stage_k, tri, w2c, labels)
    tpl = timeit(stage_pl, tri, w2c, labels)
    tcc = timeit(stage_cc, tri, w2c, labels)
    acc = jnp.zeros((n_faces, n_classes), jnp.float32)
    tfull = timeit(stage_full, tri, w2c, labels, acc)
    ms = 1e3 / g
    print(f"K    (kernels only)        {tk*ms:7.1f} ms/view")
    print(f"PL   (+ entry compaction)  {tpl*ms:7.1f}  (+{(tpl-tk)*ms:.1f})")
    print(f"CC   (+ concat+win+perm)   {tcc*ms:7.1f}  (+{(tcc-tpl)*ms:.1f})")
    print(f"FULL (+ fold + acc)        {tfull*ms:7.1f}  (+{(tfull-tcc)*ms:.1f})")


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


if __name__ == "__main__":
    sys.exit(main())
