"""Quantify the sharding overhead of the distributed pipeline
(VERDICT r4 #10): flat single-device aggregation vs the same work
through ``shard_map + psum`` on a 1-device mesh (pure wrapper cost) and
on the full device mesh.

On CPU (virtual 8-device mesh; run under
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
via the test conftest pattern) this records the dryrun-scale step-time
breakdown; on the real TPU chip it bounds the shard_map/psum((F,C))
cost per group (flagship-through-mesh(1) should be within ~5% of flat).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_multichip.py [--tpu-scale]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu-scale", action="store_true",
                    help="4K/1M-face scale (default: dryrun-tiny)")
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from geograypher_tpu.ops.agg_tiled import fold_tile_counts
    from geograypher_tpu.ops.rasterize import (
        RasterConfig,
        bin_all,
        fused_counts_pallas,
        setup_from_soa,
        tri_to_soa,
    )
    from geograypher_tpu.parallel.sharding import VIEW_AXIS
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        nadir_camera,
    )
    from geograypher_tpu.utils.geometric import serpentine_face_order

    if args.tpu_scale:
        H, W, n_grid, focal, n_classes = 2160, 3840, 708, 2000.0, 10
        cfg = RasterConfig(
            caps=(48, 16, 16, 16), backend="pallas", bin_block=8,
            l0_window=(5, 2), fold_w_cap=504, fold_block=4096,
        )
    else:
        H, W, n_grid, focal, n_classes = 216, 384, 71, 200.0, 10
        cfg = RasterConfig(
            caps=(16, 8, 8, 8), backend="pallas", bin_block=8,
            l0_window=(5, 2), fold_w_cap=504, fold_block=4096,
        )

    verts, faces = make_grid_mesh(
        n=n_grid, size=4.0,
        z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y),
    )
    faces = faces[serpentine_face_order(verts[faces].mean(axis=1)[:, :2])]
    n_faces = faces.shape[0]
    f_pad = -(-n_faces // 8) * 8
    tv = gather_tri_verts(verts, faces).astype(np.float32)
    if f_pad != n_faces:
        filler = np.broadcast_to(
            verts.mean(axis=0).astype(np.float32), (f_pad - n_faces, 3, 3)
        )
        tv = np.concatenate([tv, filler], axis=0)
    tri = jnp.asarray(tri_to_soa(tv))
    g = args.group
    w2c = jnp.asarray(
        np.stack([np.linalg.inv(nadir_camera(4.0, focal, W))] * g),
        jnp.float32,
    )
    labs = jax.random.randint(
        jax.random.PRNGKey(0), (g, H, W), 0, n_classes, jnp.int32
    )

    def views_body(tri, w2c_g, labs_g):
        acc = jnp.zeros((f_pad, n_classes), jnp.float32)
        for k in range(g):
            setup = setup_from_soa(tri, w2c_g[k], focal, W, H, cfg.znear)
            binned, sb = bin_all(setup, cfg, H, W)
            outs = fused_counts_pallas(setup, binned, sb, labs_g[k], cfg,
                                       H, W, n_classes)
            counts, _ = fold_tile_counts(
                outs, binned, cfg, H, W, f_pad, n_classes,
                w_cap=cfg.fold_w_cap, block=cfg.fold_block,
                return_overflow=True,
            )
            acc = acc + counts
        return acc

    def sync(x):
        return float(np.asarray(jnp.sum(x.ravel()[:16])))

    def timeit(fn, *xs):
        sync(fn(*xs))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = fn(*xs)
        sync(out)
        return (time.perf_counter() - t0) / args.reps

    flat = jax.jit(views_body)
    t_flat = timeit(flat, tri, w2c, labs)
    print(f"flat single-device, {g} views: {t_flat*1e3:8.1f} ms "
          f"({t_flat*1e3/g:.1f} ms/view)")

    devices = jax.devices()
    for n_dev in (1, len(devices)):
        if n_dev > len(devices):
            continue
        mesh = Mesh(np.array(devices[:n_dev]), (VIEW_AXIS,))

        def sharded_body(tri, w2c_s, labs_s):
            def per_device(tri, w2c_b, labs_b):
                acc = views_body(
                    tri, w2c_b.reshape((-1,) + w2c_b.shape[2:]),
                    labs_b.reshape((-1,) + labs_b.shape[2:]),
                )
                return jax.lax.psum(acc, VIEW_AXIS)

            return jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(P(), P(VIEW_AXIS), P(VIEW_AXIS)),
                out_specs=P(), check_vma=False,
            )(tri, w2c_s, labs_s)

        sharding = NamedSharding(mesh, P(VIEW_AXIS))
        # n_dev devices x g views each (same per-device work as flat)
        w2c_s = jax.device_put(
            jnp.broadcast_to(w2c[None], (n_dev,) + w2c.shape), sharding
        )
        labs_s = jax.device_put(
            jnp.broadcast_to(labs[None], (n_dev,) + labs.shape), sharding
        )
        t_sh = timeit(jax.jit(sharded_body), tri, w2c_s, labs_s)
        print(
            f"shard_map mesh({n_dev}), {g} views/device: "
            f"{t_sh*1e3:8.1f} ms ({t_sh*1e3/g:.1f} ms/view/device, "
            f"overhead vs flat {100.0*(t_sh-t_flat)/t_flat:+.1f}%)"
        )


if __name__ == "__main__":
    main()
