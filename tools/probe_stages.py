"""Per-stage device timing of the flagship raster+aggregate pipeline.

Times each stage in its own jit (setup, binning, kernels, fold) at
benchmark scale (4K, 1M faces) for a few mixed nadir/oblique views, with
level-S on or off — the attribution tool for deciding which wall to
attack next (docs/DESIGN.md keeps the history).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stages.py [--no-subtile] [--views N]

Stage splits are approximate (separate jits lose cross-stage fusion and
pay ~6 ms dispatch each); the group-step total is the honest number.
"""

import argparse
import dataclasses
import sys
import time

import numpy as np


def sync(x):
    """Force completion (block_until_ready is unreliable on axon)."""
    import jax.numpy as jnp

    leaves = [l for l in __import__("jax").tree.leaves(x)]
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8])))


def timeit(fn, *args, reps=3):
    fn(*args)  # warm (compile)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-subtile", action="store_true")
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--fold-block", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops.agg_tiled import (
        fold_tile_counts_grouped,
        fold_window_overflow,
    )
    from geograypher_tpu.ops.rasterize import (
        RasterConfig,
        bin_all,
        bin_triangles,
        fused_counts_pallas,
        l0_face_ids,
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

    H, W = int(2160 * args.scale), int(3840 * args.scale)
    n_grid = 708
    focals = tuple(f * args.scale for f in (2000.0, 2600.0))
    n_views = args.views
    n_classes = 10
    bin_block = 8
    subtile_on = not args.no_subtile

    from geograypher_tpu.utils.geometric import serpentine_face_order

    verts, faces = make_grid_mesh(
        n=n_grid, size=4.0,
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

    rng = np.random.default_rng(0)
    w2cs, fls = [], []
    for k in range(n_views):
        focal = focals[k % 2]
        if k % 2 == 0:
            c2w = nadir_camera(4.0, focal, W)
            c2w[0, 3] += rng.uniform(-0.3, 0.3)
        else:
            # azimuths ~0/180 are the WORST case for the scanline face
            # order (depth-runs); keep them in the probe suite
            c2w = oblique_camera(
                4.0, focal, W, pitch_deg=float(rng.uniform(15.0, 35.0)),
                azimuth_deg=float(18.0 + 180.0 * (k // 2)),
            )
        w2cs.append(np.linalg.inv(c2w))
        fls.append(focal)
    w2c = jnp.asarray(np.stack(w2cs), jnp.float32)
    fl = jnp.asarray(np.array(fls), jnp.float32)
    labels = jax.random.randint(
        jax.random.PRNGKey(7), (n_views, H, W), 0, n_classes, jnp.int32
    )

    census_cfg = RasterConfig(
        caps=(8, 8, 8, 8), backend="pallas", bin_block=bin_block,
        l0_window=(5, 2),
    )
    if subtile_on:
        from geograypher_tpu.ops.subtile import (
            subtile_counts_census,
            subtile_mask8,
        )

        census_cfg = dataclasses.replace(census_cfg, subtile=(8, 16))
        s_pair, _, s_ntx0p = l0_geometry(census_cfg, H, W)

    @jax.jit
    def census(tri, w2c_k, f_k):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, census_cfg.znear)
        if not subtile_on:
            lvl = bin_triangles(setup, census_cfg, H, W, return_census=True)
            z = jnp.zeros((), jnp.int32)
            return lvl, z, z
        mask = subtile_mask8(setup, census_cfg)
        s_tot, s_worst = subtile_counts_census(
            setup, census_cfg, H, W, s_ntx0p, s_pair, kb=census_cfg.s_kb
        )
        lvl = bin_triangles(
            setup, census_cfg, H, W, return_census=True, exclude_blocks=mask
        )
        return lvl, s_tot, s_worst

    worst = np.zeros(4, np.int64)
    s_tot_w = s_pair_w = 0
    for k in range(n_views):
        lvl, s_tot, s_worst = census(tri, w2c[k], fl[k])
        worst = np.maximum(worst, np.asarray(lvl))
        s_tot_w = max(s_tot_w, int(np.asarray(s_tot)))
        s_pair_w = max(s_pair_w, int(np.asarray(s_worst)))
    caps = tuple(int(max(16, -(-int(c * 5 // 4) // 16) * 16)) for c in worst)
    config = RasterConfig(
        caps=caps, backend="pallas", bin_block=bin_block, l0_window=(5, 2),
        fold_block=args.fold_block,
    )
    if subtile_on:
        s_cap = -(-int(s_tot_w) // census_cfg.s_kb) * census_cfg.s_kb
        s_pc = -(-int(s_pair_w) // census_cfg.s_kb) * census_cfg.s_kb
        config = dataclasses.replace(
            config, subtile=(8, 16), s_cap_chunks=max(s_cap, 4),
            s_pair_chunks=max(s_pc, 4),
        )
    print(f"caps={caps} s_cap={s_tot_w} s_pair={s_pair_w}", file=sys.stderr)

    @jax.jit
    def window_stats(tri, w2c_k, f_k):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, config.znear)
        binned, sb = bin_all(setup, config, H, W)
        over, win = fold_window_overflow(
            l0_face_ids(binned, config), n_faces=n_faces, w_cap=504,
            block=args.fold_block,
        )
        if sb is not None:
            from geograypher_tpu.ops.subtile import s_entry_ids

            _so, s_win = fold_window_overflow(
                s_entry_ids(sb, config), n_faces=n_faces, w_cap=504,
                block=args.fold_block,
            )
            win = jnp.maximum(win, s_win)
        from geograypher_tpu.ops.agg_tiled import entry_occupancy

        return win, entry_occupancy(binned, config, H, W)

    max_win = 0
    worst_entries = np.zeros(3, np.int64)
    for k in range(n_views):
        win, occ = window_stats(tri, w2c[k], fl[k])
        max_win = max(max_win, int(np.asarray(win)))
        worst_entries = np.maximum(worst_entries, np.asarray(occ))
    entry_caps = tuple(
        int(8 * (-(-int(v * 5 // 4) // 8))) for v in worst_entries
    )
    config = dataclasses.replace(config, entry_caps=entry_caps)

    # ---- stage jits -------------------------------------------------------
    @jax.jit
    def stage_setup(tri, w2c_k, f_k):
        return setup_from_soa(tri, w2c_k, f_k, W, H, config.znear)

    @jax.jit
    def stage_bin(tri, w2c_k, f_k):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, config.znear)
        return bin_all(setup, config, H, W)

    @jax.jit
    def stage_kernels(tri, w2c_k, f_k, lab):
        setup = setup_from_soa(tri, w2c_k, f_k, W, H, config.znear)
        binned, sb = bin_all(setup, config, H, W)
        return fused_counts_pallas(
            setup, binned, sb, lab, config, H, W, n_classes
        )

    def make_group(g):
        @jax.jit
        def group_step(tri, w2cs_g, fls_g, labels_g, acc):
            views = []
            for k in range(g):
                setup = setup_from_soa(
                    tri, w2cs_g[k], fls_g[k], W, H, config.znear
                )
                binned, sb = bin_all(setup, config, H, W)
                outs = fused_counts_pallas(
                    setup, binned, sb, labels_g[k], config, H, W, n_classes
                )
                views.append((outs, binned))
            counts, _over = fold_tile_counts_grouped(
                views, config, H, W, n_faces, n_classes,
                w_cap=8 * ((g * max_win * 5 // 4 + 7) // 8),
                block=args.fold_block,
                return_overflow=True,
            )
            return acc + counts

        return group_step

    t_setup = timeit(stage_setup, tri, w2c[0], fl[0])
    print(f"setup:            {t_setup * 1e3:8.2f} ms/view")
    t_bin = timeit(stage_bin, tri, w2c[1], fl[1])
    print(f"setup+bin:        {t_bin * 1e3:8.2f} ms/view")
    t_kern = timeit(stage_kernels, tri, w2c[1], fl[1], labels[1])
    print(f"setup+bin+kernel: {t_kern * 1e3:8.2f} ms/view")

    g = n_views
    group_step = make_group(g)
    acc0 = jnp.zeros((n_faces, n_classes), jnp.float32)
    group_step(tri, w2c, fl, labels, acc0)
    sync(group_step(tri, w2c, fl, labels, acc0))
    t0 = time.perf_counter()
    out = group_step(tri, w2c, fl, labels, acc0)
    sync(out)
    t_group = (time.perf_counter() - t0) / g
    print(f"full group step:  {t_group * 1e3:8.2f} ms/view "
          f"({1.0 / t_group:.2f} views/s, group={g})")
    # per-view odd/even split: oblique views cost more
    tks = []
    for k in range(min(n_views, 4)):
        tk = timeit(stage_kernels, tri, w2c[k], fl[k], labels[k], reps=2)
        tks.append(tk)
        kind = "nadir " if k % 2 == 0 else "oblique"
        print(f"  view {k} ({kind}): setup+bin+kernel {tk * 1e3:8.2f} ms")
    if tks:
        mean_k = sum(tks) / len(tks)
        print(f"implied fold+glue: {1e3 * (t_group - mean_k):8.2f} ms/view "
              f"(group step {1e3 * t_group:.2f} - mean kernel chain "
              f"{1e3 * mean_k:.2f})")

    # fold-only: feed the captured kernel outputs through the grouped
    # fold in its own jit (attribution for the fold+glue block)
    import functools

    views_dev = []
    for k in range(g):
        setup_binned = stage_bin(tri, w2c[k], fl[k])
        outs = stage_kernels(tri, w2c[k], fl[k], labels[k])
        views_dev.append((outs, setup_binned[0]))

    @functools.partial(jax.jit, static_argnames=("blk", "kb", "wc"))
    def fold_only(flat, blk, kb=8, wc=None):
        views_r = jax.tree.unflatten(treedef, flat)
        counts, _over = fold_tile_counts_grouped(
            views_r,
            dataclasses.replace(config, fold_block=blk, fold_unit_kb=kb),
            H, W, n_faces, n_classes,
            w_cap=wc if wc else 8 * ((g * max_win * 5 // 4 + 7) // 8),
            block=blk, return_overflow=True,
        )
        return counts

    flat, treedef = jax.tree.flatten(views_dev)
    for blk in (4096, 8192, 16384, 32768):
        tf = timeit(fold_only, flat, blk)
        print(f"fold-only (block={blk:5d}): {tf * 1e3 / g:8.2f} ms/view")

    # ---- fold attribution -------------------------------------------------
    # entries-only: _per_level_entries incl. entry compaction, no fold
    # kernel; fixed-cost fold: w_cap=8 strips the window-proportional
    # kernel work (one DMA batch per block), leaving relayout/takes/
    # window build + per-block fixed kernel cost; kb sweep: DMA batch
    # width of the unit kernel (issue/semaphore amortization).
    from geograypher_tpu.ops.agg_tiled import _per_level_entries

    @jax.jit
    def entries_only(flat):
        views_r = jax.tree.unflatten(treedef, flat)
        lv = [
            _per_level_entries(outs, binned, config, H, W)
            for outs, binned in views_r
        ]
        return sum(jnp.sum(l[0][:2, :, :2]) for v in lv for l in v)

    te = timeit(entries_only, flat)
    print(f"entries-only:            {te * 1e3 / g:8.2f} ms/view")
    tfx = timeit(fold_only, flat, args.fold_block, 8, 8)
    print(f"fold fixed (w_cap=8):    {tfx * 1e3 / g:8.2f} ms/view")
    for kb in (8, 16, 32, 64):
        tk2 = timeit(fold_only, flat, args.fold_block, kb)
        print(f"fold-only kb={kb:2d}:        {tk2 * 1e3 / g:8.2f} ms/view")
    for kb in (16, 32, 64):
        tk2 = timeit(fold_only, flat, 16384, kb)
        print(f"fold-only kb={kb:2d} blk16k:  {tk2 * 1e3 / g:8.2f} ms/view")


if __name__ == "__main__":
    main()
