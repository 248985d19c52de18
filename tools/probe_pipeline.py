"""Instrumented run of the distributed streaming pipeline at bench scale.

Enables DEBUG logging on parallel.pipeline so each step prints its
put-wait / dispatch split, exposing where the streaming path serializes.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pipeline.py [--views N] [--group G]
"""

import argparse
import logging
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--subtile", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(level=logging.DEBUG, format="%(relativeCreated)8.0f %(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)

    import dataclasses

    from geograypher_tpu.cameras.core import CameraSet
    from geograypher_tpu.meshes.mesh import TexturedMesh
    from geograypher_tpu.ops.rasterize import RasterConfig
    from geograypher_tpu.parallel.pipeline import (
        aggregate_class_images_distributed,
    )
    from geograypher_tpu.utils.fixtures import (
        make_grid_mesh,
        nadir_camera,
        oblique_camera,
    )

    H, W = 2160, 3840
    focals = (2000.0, 2600.0)
    n_views = args.views
    n_classes = 10

    verts, faces = make_grid_mesh(
        n=708, size=4.0,
        z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y),
    )
    rng = np.random.default_rng(0)
    c2ws = []
    for k in range(n_views):
        focal = focals[k % 2]
        if k % 2 == 0:
            c2w = nadir_camera(4.0, focal, W)
            c2w[0, 3] += rng.uniform(-0.3, 0.3)
        else:
            c2w = oblique_camera(
                4.0, focal, W, pitch_deg=float(rng.uniform(15.0, 35.0)),
                azimuth_deg=float(360.0 * k / n_views),
            )
        c2ws.append(c2w)

    # the bench's censused caps for this exact suite (bench.py seed 0,
    # plain tile path, serpentine face order)
    config = RasterConfig(
        caps=(96, 16, 16, 16), backend="pallas", bin_block=8,
        l0_window=(5, 2),
    )
    if args.subtile:
        config = dataclasses.replace(config, subtile=(8, 16))

    mesh = TexturedMesh((verts, faces), raster_config=config)
    mesh.spatial_sort_faces()
    sensors = {
        si: {"f": f, "cx": 0.0, "cy": 0.0,
             "image_width": W, "image_height": H}
        for si, f in enumerate(focals)
    }
    cams = CameraSet(
        c2ws, sensors, sensor_IDs=[k % 2 for k in range(n_views)]
    )
    rng_p = np.random.default_rng(1)
    label_imgs = [
        rng_p.integers(0, n_classes, (H, W)).astype(np.int32)
        for _ in range(n_views)
    ]

    for rep in ("warm", "timed"):
        t0 = time.perf_counter()
        fracs, views_seen = aggregate_class_images_distributed(
            mesh, cams, n_classes,
            class_image_provider=lambda i: label_imgs[i],
            views_per_step=args.group,
        )
        dt = time.perf_counter() - t0
        print(f"{rep}: {n_views / dt:.2f} views/s ({dt:.1f}s total)")


if __name__ == "__main__":
    main()
