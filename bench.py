"""Benchmark: rasterize + aggregate drone views over a 1M-face mesh.

Measures the flagship pipeline — pix2face rasterization of 4K views plus
per-face class aggregation — on the available accelerator(s), matching the
BASELINE.json target: 1000 x 4K views over a 1M-face mesh in < 10 s on a
v5e-8, i.e. 100 views/s (12.5 views/s per chip).

The workload is deliberately VARIED (not tuned-friendly): a mix of nadir
and oblique poses (off-nadir pitches verified through the camera-set
view-angle API), two focal lengths, and an independent label image per
view; all static capacities (binning caps, fold windows) are sized from
the WORST view and checked, never assumed.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_backend(timeouts=(600, 300)):
    """Check the JAX backend is reachable from a SUBPROCESS first.

    The axon backend's failure mode during outages is a HANG inside
    PJRT init (C code — Python signal handlers never fire), which in
    round 3 cost the whole benchmark record: the driver's timeout
    killed the process before any JSON was printed.  Probing in a
    killable child (inheriting PYTHONPATH/sitecustomize, so the same
    init path) turns a hang into a timeout we can report.  Retries
    once with a shorter timeout before giving up.
    """
    code = (
        "import jax, sys; b = jax.default_backend(); "
        "print('BACKEND=' + b)"
    )
    env_t = os.environ.get("BENCH_PROBE_TIMEOUTS")
    if env_t:
        timeouts = tuple(float(t) for t in env_t.split(","))
    last = None
    for attempt, t in enumerate(timeouts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=t,
            )
            if r.returncode == 0 and "BACKEND=" in r.stdout:
                return r.stdout.split("BACKEND=")[1].strip()
            last = RuntimeError(
                f"probe rc={r.returncode}: "
                f"{(r.stderr or r.stdout).strip()[-400:]}"
            )
        except subprocess.TimeoutExpired:
            last = RuntimeError(f"backend init hung > {t}s (attempt "
                                f"{attempt + 1})")
        print(f"backend probe attempt {attempt + 1} failed: {last}",
              file=sys.stderr)
    raise last


def run_bench(out):
    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops.agg_tiled import (
        entry_occupancy,
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

    on_tpu = jax.default_backend() not in ("cpu",)
    out["metric"] = (
        "4K mixed nadir/oblique views rasterized+aggregated per second "
        "(1M-face mesh)"
        if on_tpu
        else "smoke views/s (CPU, reduced scale)"
    )
    # Full benchmark scale on accelerators; a tiny smoke run on CPU
    # (same fused kernels via the interpreter)
    if on_tpu:
        H, W = 2160, 3840
        n_grid = 708  # -> 999,698 faces
        focals = (2000.0, 2600.0)
        n_views = 20
        n_classes = 10
        group_init = 20  # views folded per face-block-kernel launch
    else:
        H, W = 216, 384
        n_grid = 71
        focals = (200.0, 260.0)
        n_views = 2
        n_classes = 10
        group_init = 2
    backend = "pallas"
    bin_block = 8  # faces per binned unit (scanline runs -> ~8x cheaper
    #                sort/gathers; see RasterConfig.bin_block)

    verts, faces = make_grid_mesh(
        n=n_grid, size=4.0, z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y)
    )
    # serpentine spatial order, as TexturedMesh.spatial_sort_faces applies
    # in production (row-wrap blocks otherwise land at the coarse levels)
    from geograypher_tpu.utils.geometric import serpentine_face_order

    faces = faces[serpentine_face_order(verts[faces].mean(axis=1)[:, :2])]
    n_faces = faces.shape[0]
    # pad to a bin_block multiple with degenerate (zero-area -> culled)
    # filler triangles, mirroring TexturedMesh's face-bucket padding
    f_pad = -(-n_faces // bin_block) * bin_block
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    # (9, F) coordinate rows: full-lane VPU geometry (see tri_to_soa)
    tri = jnp.asarray(tri_to_soa(tv))

    # Varied view suite: translated nadir passes + an oblique orbit at
    # 15-35 deg off-nadir, alternating between two focal lengths.
    def build_suite(H_, W_, focals_):
        rng = np.random.default_rng(0)
        c2ws_, fls_ = [], []
        for k in range(n_views):
            focal = focals_[k % len(focals_)]
            if k % 2 == 0:
                c2w = nadir_camera(4.0, focal, W_)
                c2w[0, 3] += rng.uniform(-0.3, 0.3)
                c2w[1, 3] += rng.uniform(-0.3, 0.3)
                c2w[2, 3] += rng.uniform(0.0, 0.3)
            else:
                c2w = oblique_camera(
                    4.0, focal, W_,
                    pitch_deg=float(rng.uniform(15.0, 35.0)),
                    azimuth_deg=float(360.0 * k / n_views),
                )
            c2ws_.append(c2w)
            fls_.append(focal)
        w2c_ = jnp.asarray(
            np.stack([np.linalg.inv(m) for m in c2ws_]), jnp.float32
        )
        fl_ = jnp.asarray(np.array(fls_), jnp.float32)
        labels_ = jax.random.randint(
            jax.random.PRNGKey(7), (n_views, H_, W_), 0, n_classes,
            jnp.int32,
        )
        return c2ws_, fls_, w2c_, fl_, labels_

    c2ws, fls, w2c, fl, labels = build_suite(H, W, focals)

    # verify the pose spread through the production camera API: build a
    # georeferenced CameraSet at a mid-latitude site and measure off-nadir
    # angles the way the reference does (cameras.py:244-326)
    if n_views >= 4:
        from geograypher_tpu.cameras.core import CameraSet
        from geograypher_tpu.utils import crs as crs_utils

        centroid = np.asarray(
            crs_utils.lla_to_ecef(36.0, -119.0, 100.0), np.float64
        ).reshape(3)
        up = centroid / np.linalg.norm(centroid)
        east = np.cross([0, 0, 1], up)
        east /= np.linalg.norm(east)
        north = np.cross(up, east)
        l2e = np.eye(4)
        l2e[:3, 0], l2e[:3, 1], l2e[:3, 2], l2e[:3, 3] = (
            east, north, up, centroid,
        )
        angle_cams = CameraSet(
            c2ws,
            {0: {"f": fls[0], "cx": 0.0, "cy": 0.0,
                 "image_width": W, "image_height": H}},
            local_to_epsg_4978_transform=l2e,
        )
        pitches = np.abs(angle_cams.get_camera_view_angles()[:, 0])
        if not (pitches.max() > 14.0 and pitches.min() < 6.0):
            raise RuntimeError(
                f"benchmark pose suite lost its spread: off-nadir pitches "
                f"{pitches.min():.1f}..{pitches.max():.1f} deg"
            )

    # Per-view label images are generated on device inside build_suite
    # (the dev host<->device tunnel is ~40 MB/s; production links are not
    # the benchmark target here — the streaming metric below includes
    # them).
    # oblique views see past the finite test plane: nadir views cover
    # ~93% of pixels, 35-deg oblique ones ~60+% — the guard only needs to
    # catch empty/corrupted kernel output, not certify exact coverage
    cover_min = 0.45

    def flagship(subtile_on, H, W, w2c, fl, labels, max_buckets=None):
        """The full flagship measurement: census -> caps -> fold-window
        probe -> group-size selection -> timed run, at the given image
        scale.  Self-contained so a level-S failure at full scale can
        fall back to the plain tile path (subtile_on=False) instead of
        losing the benchmark run.  Returns (views_per_sec, config).
        """
        # All views inside one dispatch — amortizes the host->device
        # dispatch latency (~6 ms/view through this runtime).  The
        # pipeline is the FUSED scatter-free path (docs/DESIGN.md): the
        # raster kernel itself emits per-tile (class, slot) counts
        # alongside pix2face, and groups of views share one face-block
        # fold launch (the cross-view count sum commutes with the fold).
        # No XLA scatter ever consumes a Mosaic output, and the view loop
        # is python-unrolled, not lax.scan — both of which this runtime
        # corrupts silently.
        # Static capacities are sized from the WORST view of the suite:
        # an exact binning census fixes the per-level caps (oblique
        # far-field tiles hold several hundred faces — no guessed cap
        # survives a varied suite), then the fold's per-block tile
        # windows are measured, and binned.overflow re-checks the caps.
        # Level-S sub-tile raster (ops/subtile.py): tiny far-field units
        # are diverted to (8, 16)-cell lists and resolved lane-packed
        # (~3.5x less VPU resolve work on this varied suite).
        census_cfg = RasterConfig(
            caps=(8, 8, 8, 8), backend=backend, bin_block=bin_block,
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
                lvl = bin_triangles(
                    setup, census_cfg, H, W, return_census=True
                )
                z = jnp.zeros((), jnp.int32)
                return lvl, z, z
            mask = subtile_mask8(setup, census_cfg)
            s_tot, s_worst = subtile_counts_census(
                setup, census_cfg, H, W, s_ntx0p, s_pair,
                kb=census_cfg.s_kb,
            )
            lvl = bin_triangles(
                setup, census_cfg, H, W, return_census=True,
                exclude_blocks=mask,
            )
            return lvl, s_tot, s_worst

        # Per-view census -> per-view margined caps.  Views are BUCKETED
        # by caps rounded up to a coarse grid and each bucket runs its
        # own jit program: mixed suites stop paying the worst view's
        # static shapes (a nadir view at the worst oblique's L0 cap 96
        # measured 83 ms vs 55 at its own cap — docs/DESIGN.md round 4).
        CAP_GRID = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)

        def margin_caps(lvl):
            return tuple(
                int(max(16, -(-int(c * 5 // 4) // 16) * 16)) for c in lvl
            )

        def bucket_key(caps):
            return tuple(
                min((g for g in CAP_GRID if g >= c), default=c) for c in caps
            )

        view_caps = []
        view_s = []
        for k in range(n_views):
            lvl, s_tot, s_worst = census(tri, w2c[k], fl[k])
            view_caps.append(margin_caps(np.asarray(lvl)))
            view_s.append(
                (int(np.asarray(s_tot)), int(np.asarray(s_worst)))
            )
        buckets: dict = {}
        for k, caps_k in enumerate(view_caps):
            buckets.setdefault(bucket_key(caps_k), []).append(k)
        # Cap the bucket count: every bucket compiles its own group
        # program through the remote compiler (minutes each), and the
        # marginal speedup of a tiny bucket never pays for its compile.
        # Merge the smallest-view-count bucket into whichever other
        # bucket costs least extra static-shape work (views moved up to
        # the elementwise-max caps), until the cap is met.
        if max_buckets is None:
            max_buckets = int(os.environ.get("BENCH_MAX_BUCKETS", "4"))
        while len(buckets) > max(1, max_buckets):
            keys = sorted(buckets, key=lambda key: (len(buckets[key]), sum(key)))
            src = keys[0]

            def merge_cost(dst):
                merged = tuple(max(a, b) for a, b in zip(src, dst))
                return sum(merged) * (len(buckets[src]) + len(buckets[dst])) - (
                    sum(src) * len(buckets[src]) + sum(dst) * len(buckets[dst])
                )

            dst = min((key for key in keys[1:]), key=merge_cost)
            merged_key = tuple(max(a, b) for a, b in zip(src, dst))
            views_merged = buckets.pop(src) + buckets.pop(dst)
            buckets.setdefault(merged_key, []).extend(views_merged)
        print(
            "census buckets: "
            + ", ".join(f"{key} x{len(v)}" for key, v in buckets.items()),
            file=sys.stderr,
        )

        def build_bucket(caps, idxs):
            """Sized config + fold stats + group program for one bucket."""
            config = RasterConfig(
                caps=caps, backend=backend, bin_block=bin_block,
                l0_window=(5, 2),
            )
            if subtile_on:
                # the S census is EXACT per view and the same views run
                # the bench, so the bucket-worst demand needs no margin
                # (only kb alignment)
                s_tot_w = max(view_s[k][0] for k in idxs)
                s_pair_w = max(view_s[k][1] for k in idxs)
                s_cap = -(-int(s_tot_w) // census_cfg.s_kb) * census_cfg.s_kb
                s_pc = -(-int(s_pair_w) // census_cfg.s_kb) * census_cfg.s_kb
                print(
                    f"  S census: {s_tot_w} chunks (cap {s_cap}), worst "
                    f"pair {s_pair_w} (cap {s_pc})",
                    file=sys.stderr,
                )
                config = dataclasses.replace(
                    config, subtile=(8, 16), s_cap_chunks=max(s_cap, 4),
                    s_pair_chunks=max(s_pc, 4),
                )

            from geograypher_tpu.ops.rasterize import _occupied_pairs

            pair_, nty0p_, ntx0p_ = l0_geometry(config, H, W)
            n_pairs_tot = nty0p_ * (ntx0p_ // pair_)

            @jax.jit
            def window_stats(tri, w2c_k, f_k):
                setup = setup_from_soa(
                    tri, w2c_k, f_k, W, H, config.znear
                )
                binned, sb = bin_all(setup, config, H, W)
                over, win = fold_window_overflow(
                    l0_face_ids(binned, config), n_faces=n_faces,
                    w_cap=504, block=4096,
                )
                bin_over = binned.overflow
                if sb is not None:
                    from geograypher_tpu.ops.subtile import s_entry_ids

                    _so, s_win = fold_window_overflow(
                        s_entry_ids(sb, config), n_faces=n_faces,
                        w_cap=504, block=4096,
                    )
                    win = jnp.maximum(win, s_win)
                    bin_over = bin_over + sb.overflow
                # exact occupied-pair count for this view (sizes
                # config.occ_pairs — the compacted kernel grid)
                _pids, occ_mask, _oo = _occupied_pairs(
                    setup, binned, sb,
                    dataclasses.replace(config, occ_pairs=n_pairs_tot),
                    H, W,
                )
                return over, win, bin_over, entry_occupancy(
                    binned, config, H, W
                ), jnp.sum(occ_mask.astype(jnp.int32))

            max_win = 0
            max_occ = 0
            worst_entries = np.zeros(3, np.int64)
            for k in idxs:
                _over, win, bin_over, occ, n_occ = window_stats(
                    tri, w2c[k], fl[k]
                )
                win = int(np.asarray(win))
                bin_over = int(np.asarray(bin_over))
                if bin_over:
                    raise RuntimeError(
                        f"view {k}: rasterizer cap overflow ({bin_over} "
                        f"candidates dropped) — raise caps {caps}"
                    )
                # win is the EXACT per-block max window for this view
                # (the probe w_cap does not clip it); the grouped fold
                # sizes from the worst
                max_win = max(max_win, win)
                max_occ = max(max_occ, int(np.asarray(n_occ)))
                worst_entries = np.maximum(worst_entries, np.asarray(occ))
            # per-view nonempty chunk-entry caps (1.25x margin):
            # compacting each view's fold entries to its occupied chunks
            # right after the raster keeps the dense census-cap count
            # buffers from staying live across the whole group (they are
            # ~5x occupancy and OOMed group-20)
            entry_caps = tuple(
                int(8 * (-(-int(n * 5 // 4) // 8))) for n in worst_entries
            )
            # occupied-pair grid compaction: exact per-view census (the
            # same views run the bench), small alignment pad only
            occ_cap = min(8 * (-(-max_occ // 8)) + 8, n_pairs_tot)
            print(
                f"  entry caps (128-slot chunks/view): {entry_caps}; "
                f"occupied pairs {max_occ}/{n_pairs_tot} (cap {occ_cap})",
                file=sys.stderr,
            )
            return dataclasses.replace(
                config, entry_caps=entry_caps, occ_pairs=occ_cap
            ), max_win

        # One jit program per GROUP of views, chained on a device-resident
        # accumulator.  Large many-chain programs trigger the runtime's
        # silent-corruption bug for SOME chains (docs/DESIGN.md); the
        # small per-group program shape is the one validated clean, and
        # every group's output is coverage-checked at warmup.  Dispatches
        # queue asynchronously, so the per-program overhead is pipelined
        # away.
        def make_group_step(config, max_win, g):
            @jax.jit
            def group_step(tri, w2cs_g, fls_g, labels_g, acc):
                views = []
                over = jnp.zeros((), jnp.int32)
                for k in range(g):
                    setup = setup_from_soa(
                        tri, w2cs_g[k], fls_g[k], W, H, config.znear
                    )
                    binned, sb = bin_all(setup, config, H, W)
                    outs = fused_counts_pallas(
                        setup, binned, sb, labels_g[k], config, H, W,
                        n_classes,
                    )
                    if sb is not None:
                        over = over + sb.overflow
                    views.append((outs, binned))
                counts, fold_over = fold_tile_counts_grouped(
                    views, config, H, W, n_faces, n_classes,
                    w_cap=8 * ((g * max_win * 5 // 4 + 7) // 8), block=4096,
                    return_overflow=True,
                )
                return acc + counts, over + fold_over

            return group_step

        # labels padded with one all-ignore image: bucket sizes that do
        # not divide the group size repeat view index n_views, which
        # contributes zero counts
        labels_pad = jnp.concatenate(
            [labels, jnp.full((1, H, W), -1, jnp.int32)], axis=0
        )
        w2c_pad = jnp.concatenate([w2c, w2c[:1]], axis=0)
        fl_pad = jnp.concatenate([fl, fl[:1]], axis=0)

        def bucket_groups(idxs, g):
            padded = list(idxs) + [n_views] * (-len(idxs) % g)
            return [padded[i:i + g] for i in range(0, len(padded), g)]

        def run_all(plans, warm_check=False):
            """plans: list of (group_step, idx_groups, entry_caps)."""
            acc = jnp.zeros((n_faces, n_classes), jnp.float32)
            done = 0
            for group_step, idx_groups, entry_caps in plans:
                for gi, idx in enumerate(idx_groups):
                    sel = jnp.asarray(idx, jnp.int32)
                    acc, over = group_step(
                        tri, w2c_pad[sel], fl_pad[sel], labels_pad[sel],
                        acc,
                    )
                    done += sum(1 for i in idx if i < n_views)
                    if warm_check:
                        n_over = int(np.asarray(over))
                        if n_over:
                            raise RuntimeError(
                                f"group {gi}: fold dropped {n_over} "
                                f"entries (window w_cap or entry_caps "
                                f"{entry_caps} undersized)"
                            )
                        got = float(np.asarray(jnp.sum(acc)))
                        want = 0.85 * done * H * W * cover_min
                        if got < want:
                            raise RuntimeError(
                                f"group {gi}: sum {got:.3g} < {want:.3g} "
                                "(corrupted Mosaic output)"
                            )
            return acc

        # build each bucket's program, falling back to smaller group
        # sizes on corruption/OOM per bucket
        plans = []
        bucket_configs = []
        for key, idxs in sorted(buckets.items()):
            print(f"bucket {key}: {len(idxs)} views", file=sys.stderr)
            config_b, max_win_b = build_bucket(key, idxs)
            bucket_configs.append((len(idxs), config_b))
            chosen = None
            g_tries = []
            for g in (min(group_init, len(idxs)), 10, 5, 4, 3, 2, 1):
                if 1 <= g <= len(idxs) and g not in g_tries:
                    g_tries.append(g)
            for g in g_tries:
                candidate = make_group_step(config_b, max_win_b, g)
                plan = (candidate, bucket_groups(idxs, g), config_b.entry_caps)
                try:
                    run_all([plan], warm_check=True)
                    chosen = plan
                    break
                except RuntimeError as e:
                    print(
                        f"  bucket {key} group={g}: {e}; retrying smaller",
                        file=sys.stderr,
                    )
                    # drop every reference to the failed attempt's device
                    # buffers (incl. the exception traceback) before
                    # trying the next size — OOM-failed dispatches
                    # otherwise pin HBM and cascade smaller groups into
                    # spurious RESOURCE_EXHAUSTED
                    import gc

                    e = None
                    plan = None
                    candidate = None
                    gc.collect()
            if chosen is None:
                raise RuntimeError(
                    f"bucket {key}: all group sizes produced corrupted "
                    "output"
                )
            plans.append(chosen)

        acc = run_all(plans, warm_check=True)
        warm_sum = float(np.asarray(jnp.sum(acc)))

        # per-bucket attribution (sync per bucket; diagnostic only — the
        # headline metric below times the whole suite in one stream)
        for plan in plans:
            nv = sum(
                1 for idx in plan[1] for i in idx if i < n_views
            )
            t0 = time.perf_counter()
            a = run_all([plan])
            np.asarray(jnp.sum(a))
            dt_b = time.perf_counter() - t0
            print(
                f"  bucket timing: {nv} views in {dt_b*1e3:.0f} ms "
                f"({dt_b*1e3/max(nv,1):.1f} ms/view)",
                file=sys.stderr,
            )

        t0 = time.perf_counter()
        total = run_all(plans)
        np.asarray(jnp.sum(total))
        dt = time.perf_counter() - t0
        if abs(
            float(np.asarray(jnp.sum(total))) - warm_sum
        ) > 1e-3 * warm_sum:
            raise RuntimeError("timed run disagrees with warmup output")
        # downstream metrics (the streaming pipeline) need ONE config
        # whose binning caps cover EVERY view: take the elementwise max
        # over bucket caps, and drop the flagship's view-exact sizings
        # (entry caps, occupied-pair cap) — the pipeline sizes its own
        # (the max-cap-SUM bucket config used before round 4 did not
        # cover other buckets' L2 caps and overflowed the r4 pipeline
        # metric)
        cover_caps = tuple(
            max(t[1].caps[i] for t in bucket_configs) for i in range(4)
        )
        config = dataclasses.replace(
            bucket_configs[0][1], caps=cover_caps, entry_caps=None,
            occ_pairs=None,
        )
        return n_views / dt, config

    # Level-S sub-tile raster: OFF by default since round-4 on-device
    # measurement — at full 4K its CSR build (+23 ms/view), second kernel
    # pass, and 29k-chunk fold level cost MORE than the resolve it saves
    # (5.36 vs 6.93 views/s on this suite; docs/DESIGN.md round-4 entry).
    want_subtile = (
        os.environ.get("BENCH_SUBTILE", "0") == "1" and backend == "pallas"
    )

    def flagship_safe(subtile_on, H_, W_, focals_, max_buckets=None):
        suite = build_suite(H_, W_, focals_)[2:]
        try:
            return flagship(subtile_on, H_, W_, *suite,
                            max_buckets=max_buckets)
        except Exception as e:
            if not subtile_on:
                raise
            print(
                f"level-S flagship path failed ({e!r}); falling back to "
                "the plain tile path",
                file=sys.stderr,
            )
            return flagship(False, H_, W_, *suite, max_buckets=max_buckets)

    views_per_sec, config = flagship_safe(want_subtile, H, W, focals)
    n_dev = jax.device_count()
    # target: 100 views/s on 8 chips -> 12.5 views/s per chip
    target = 12.5 * n_dev if on_tpu else None
    out["value"] = round(views_per_sec, 3)
    out["vs_baseline"] = round(views_per_sec / target, 4) if target else 0.0

    # Secondary metric: the same suite aggregated at the reference
    # examples' own working scale (aggregate_img_scale = 0.25 in
    # /root/reference/examples/aggregate_predictions.ipynb) — what a
    # reference user's default workflow would actually run per 4K view.
    refscale_vps = None
    if on_tpu and os.environ.get("BENCH_REFSCALE", "1") == "1":
        try:
            refscale_vps, _ = flagship_safe(
                want_subtile, H // 4, W // 4,
                tuple(f * 0.25 for f in focals),
                max_buckets=2,
            )
            refscale_vps = round(refscale_vps, 3)
        except Exception as e:
            print(f"refscale metric failed: {e!r}", file=sys.stderr)
    if refscale_vps is not None:
        out["refscale_views_per_s"] = refscale_vps
        out["refscale_note"] = (
            "same 4K suite aggregated at the reference examples' "
            "aggregate_img_scale=0.25 working scale"
        )

    # Second, honest END-TO-END number through the production streaming
    # path: aggregate_class_images_distributed with host-thread label
    # prefetch, grouped views per device step and packed transfers.  On
    # this development environment the host<->device link is a ~40 MB/s
    # tunnel, so this measures the full pipeline including transfer
    # (production PCIe/ICI links are orders of magnitude faster).
    pipeline_vps = None
    try:
        from geograypher_tpu.cameras.core import CameraSet
        from geograypher_tpu.meshes.mesh import TexturedMesh
        from geograypher_tpu.parallel.pipeline import (
            aggregate_class_images_distributed,
        )

        tmesh = TexturedMesh(
            (verts, faces),
            raster_config=config,
        )
        sensors = {
            si: {
                "f": focal, "cx": 0.0, "cy": 0.0,
                "image_width": W, "image_height": H,
            }
            for si, focal in enumerate(focals)
        }
        cams = CameraSet(
            c2ws, sensors,
            sensor_IDs=[k % len(focals) for k in range(n_views)],
        )
        rng_p = np.random.default_rng(1)
        label_imgs = [
            rng_p.integers(0, n_classes, (H, W)).astype(np.int32)
            for _ in range(n_views)
        ]
        # warm: one pass to compile the device step
        aggregate_class_images_distributed(
            tmesh, cams, n_classes,
            class_image_provider=lambda i: label_imgs[i],
        )
        t0 = time.perf_counter()
        fracs, views_seen = aggregate_class_images_distributed(
            tmesh, cams, n_classes,
            class_image_provider=lambda i: label_imgs[i],
        )
        dt_p = time.perf_counter() - t0
        if float(views_seen.max()) < 1:
            raise RuntimeError("pipeline produced no observations")
        pipeline_vps = round(n_views / dt_p, 3)
    except Exception as e:  # report the flagship metric regardless
        print(f"pipeline metric failed: {e!r}", file=sys.stderr)
    if pipeline_vps is not None:
        out["pipeline_views_per_s"] = pipeline_vps
        out["pipeline_note"] = (
            "end-to-end streaming path incl. host prefetch + tunnel-"
            "limited image transfer (worst case: incompressible random "
            "labels, dense int8 transport)"
        )

    # Same streaming path with REALISTIC segmentation masks (spatially
    # coherent class regions, like any real predictor's output): the
    # pipeline's auto label transport ships them as RLE (device decode is
    # exact), cutting the per-view transfer ~10-50x.  Random-label
    # pipeline_views_per_s above remains the worst-case number.
    pipeline_rle_vps = None
    if pipeline_vps is not None:
        try:
            yy, xx = np.mgrid[0:H, 0:W]
            yy = yy.astype(np.float32)
            xx = xx.astype(np.float32)

            def coherent_label(i):
                base = (
                    np.sin(xx * 0.002 + 0.9 * i)
                    + np.cos(yy * 0.0017 + 0.4 * i)
                    + np.sin((xx + 2.0 * yy) * 0.0008 + i)
                )
                return np.clip(
                    (base + 3.0) * (n_classes / 6.0), 0, n_classes - 1
                ).astype(np.int32)

            coherent = [coherent_label(i) for i in range(n_views)]
            aggregate_class_images_distributed(
                tmesh, cams, n_classes,
                class_image_provider=lambda i: coherent[i],
            )
            t0 = time.perf_counter()
            _fr, views_seen = aggregate_class_images_distributed(
                tmesh, cams, n_classes,
                class_image_provider=lambda i: coherent[i],
            )
            dt_r = time.perf_counter() - t0
            if float(views_seen.max()) < 1:
                raise RuntimeError("rle pipeline produced no observations")
            pipeline_rle_vps = round(n_views / dt_r, 3)
        except Exception as e:
            print(f"rle pipeline metric failed: {e!r}", file=sys.stderr)
    if pipeline_rle_vps is not None:
        out["pipeline_views_per_s_rle"] = pipeline_rle_vps
        out["pipeline_rle_note"] = (
            "same streaming path with realistic coherent label masks; "
            "auto transport ships them as RLE with exact on-device decode"
        )


def main():
    """ALWAYS prints exactly one JSON line and exits 0 (VERDICT r3 #2).

    A backend outage, import failure, or kernel error becomes
    {"error": ..., "value": null}; partial metrics computed before the
    failure are preserved in the line.
    """
    out = {
        "metric": "4K views rasterized+aggregated per second (1M-face mesh)",
        "value": None,
        "unit": "views/s",
        "vs_baseline": None,
    }
    try:
        if os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
            backend = _probe_backend()
            print(f"backend probe ok: {backend}", file=sys.stderr)
        run_bench(out)
    except BaseException as e:  # noqa: BLE001 — the JSON line must survive
        if isinstance(e, KeyboardInterrupt):
            out["error"] = "interrupted"
        else:
            out["error"] = f"{type(e).__name__}: {e}"[:800]
        import traceback

        traceback.print_exc(file=sys.stderr)
    print(json.dumps(out))
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
