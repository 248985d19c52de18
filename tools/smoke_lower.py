"""Kernel-config compile smoke: sweep every shipped RasterConfig variant
through Mosaic lowering (and optionally compilation) at small scale.

MANDATORY before committing any kernel/layout/BlockSpec change
(docs/DESIGN.md "Dead ends": two historical escapes — a block-major
layout that never lowered on TPU, and an in-kernel reshape that lowered
but failed Mosaic COMPILE — would both have been caught here).

Interpret-mode CPU tests can NOT validate Mosaic's block rules, so this
must run against the axon backend:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_lower.py
    PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_lower.py --compile

``--compile`` additionally runs lowered.compile() per variant at a small
image scale (~1-2 min total client-side; catches vector-relayout errors
lower() misses).  Without it only lower() runs (seconds).

Exit code 0 = all variants pass; 1 = at least one failed (listed).
"""

import argparse
import dataclasses
import sys
import time

import numpy as np


def build_inputs(H, W, bb):
    import jax.numpy as jnp

    from geograypher_tpu.ops.rasterize import tri_to_soa
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        oblique_camera,
    )

    verts, faces = make_grid_mesh(
        n=41, size=4.0, z_fn=lambda x, y: 0.2 * np.sin(3 * x) * np.cos(2 * y)
    )
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // bb) * bb
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    tv = np.concatenate(
        [
            tv,
            np.broadcast_to(
                verts.mean(0).astype(np.float32), (f_pad - n_faces, 3, 3)
            ),
        ],
        0,
    )
    tri = jnp.asarray(tri_to_soa(tv))
    c2w = oblique_camera(3.0, 90.0, W, pitch_deg=32.0, azimuth_deg=135.0)
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    return tri, w2c, n_faces


def shipped_variants():
    """Every RasterConfig shape a production path can emit.

    Covers: default caps, bin_block on/off, both l0_window shapes, the
    level-S sub-tile chain, and the entry-cap compaction path the
    distributed pipeline uses.
    """
    from geograypher_tpu.ops.rasterize import RasterConfig

    base = dict(caps=(64, 16, 16, 16), backend="pallas")
    variants = {
        "plain": RasterConfig(**base),
        "bin_block8": RasterConfig(**base, bin_block=8, l0_window=(5, 2)),
        "window_2x2": RasterConfig(**base, bin_block=8, l0_window=(2, 2)),
        "subtile_s": RasterConfig(
            **base, bin_block=8, l0_window=(5, 2), subtile=(8, 16),
            s_cap_chunks=64, s_pair_chunks=16,
        ),
        "entry_caps": dataclasses.replace(
            RasterConfig(**base, bin_block=8, l0_window=(5, 2)),
            entry_caps=(16, 16, 16),
        ),
        "subtile_entry_caps": RasterConfig(
            **base, bin_block=8, l0_window=(5, 2), subtile=(8, 16),
            s_cap_chunks=64, s_pair_chunks=16, entry_caps=(16, 16, 16),
        ),
        "occ_pairs": RasterConfig(
            **base, bin_block=8, l0_window=(5, 2), occ_pairs=64,
        ),
        "occ_entry_caps": dataclasses.replace(
            RasterConfig(**base, bin_block=8, l0_window=(5, 2),
                         occ_pairs=64),
            entry_caps=(16, 16, 16),
        ),
        "occ_subtile": RasterConfig(
            **base, bin_block=8, l0_window=(5, 2), subtile=(8, 16),
            s_cap_chunks=64, s_pair_chunks=16, occ_pairs=64,
        ),
        "l0_group1": RasterConfig(
            **base, bin_block=8, l0_window=(5, 2), l0_group=1,
        ),
    }
    return variants


def smoke_one(name, config, H, W, n_classes, do_compile):
    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops.agg_tiled import fold_tile_counts_grouped
    from geograypher_tpu.ops.rasterize import bin_all, setup_from_soa

    bb = config.bin_block or 1
    tri, w2c, n_faces = build_inputs(H, W, bb)
    labels = jnp.zeros((H, W), jnp.int32)

    def one(tri, w2c, labels):
        from geograypher_tpu.ops.rasterize import fused_counts_pallas

        setup = setup_from_soa(tri, w2c, jnp.float32(90.0), W, H, config.znear)
        binned, sb = bin_all(setup, config, H, W)
        outs = fused_counts_pallas(
            setup, binned, sb, labels, config, H, W, n_classes
        )
        counts, over = fold_tile_counts_grouped(
            [(outs, binned)], config, H, W, n_faces, n_classes,
            w_cap=104, block=4096, return_overflow=True,
        )
        extra = sb.overflow if sb is not None else 0
        return counts, over + extra

    t0 = time.time()
    lowered = jax.jit(one).lower(tri, w2c, labels)
    t_lower = time.time() - t0
    msg = f"lower {t_lower:.1f}s"
    if do_compile:
        t0 = time.time()
        lowered.compile()
        msg += f", compile {time.time() - t0:.1f}s"
    return msg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--compile", action="store_true",
                    help="also run Mosaic compile per variant")
    ap.add_argument("--size", default="96x256",
                    help="HxW image size for the sweep")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print(
            "WARNING: backend is cpu — interpret-mode Pallas skips "
            "Mosaic's block/layout rules; run on the axon backend for a "
            "real check (PYTHONPATH must include /root/.axon_site).",
            file=sys.stderr,
        )

    variants = shipped_variants()
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    failures = []
    for name, config in variants.items():
        try:
            msg = smoke_one(name, config, H, W, 5, args.compile)
            print(f"  OK {name}: {msg}")
        except Exception as e:  # noqa: BLE001 — report all failures
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")
    if failures:
        print(f"\n{len(failures)} variant(s) FAILED: {failures}")
        return 1
    print(f"\nall {len(variants)} variants passed on backend={backend}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
