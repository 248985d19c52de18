"""Benchmark: rasterize + aggregate drone views over a 1M-face mesh.

Measures the flagship pipeline — pix2face rasterization of 4K views plus
per-face class aggregation — on the available accelerator(s), matching the
BASELINE.json target: 1000 x 4K views over a 1M-face mesh in < 10 s on a
v5e-8, i.e. 100 views/s (12.5 views/s per chip).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from geograypher_tpu.ops.aggregate import project_image_class_counts
    from geograypher_tpu.ops.rasterize import (
        RasterConfig,
        rasterize_triangles,
        transform_to_camera,
    )
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts,
        make_grid_mesh,
        nadir_camera,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    # Full benchmark scale on accelerators; a tiny smoke run on CPU
    if on_tpu:
        H, W = 2160, 3840
        n_grid = 708  # -> 999,698 faces
        focal = 2000.0
        n_views = 20
        n_classes = 10
        caps = (256, 128, 128, 128)
        backend = "pallas"
    else:
        H, W = 216, 384
        n_grid = 71
        focal = 200.0
        n_views = 2
        n_classes = 10
        caps = (256, 64, 32, 16)
        backend = "xla"

    verts, faces = make_grid_mesh(
        n=n_grid, size=4.0, z_fn=lambda x, y: 0.1 * np.sin(3 * x) * np.cos(3 * y)
    )
    n_faces = faces.shape[0]
    tri = jnp.asarray(gather_tri_verts(verts, faces), jnp.float32)
    config = RasterConfig(caps=caps, backend=backend)

    # a sweep of slightly-different views (translated/raised nadir passes)
    rng = np.random.default_rng(0)
    w2cs = []
    for k in range(n_views):
        c2w = nadir_camera(4.0, focal, W)
        c2w[0, 3] += rng.uniform(-0.3, 0.3)
        c2w[1, 3] += rng.uniform(-0.3, 0.3)
        c2w[2, 3] += rng.uniform(0.0, 0.3)
        w2cs.append(np.linalg.inv(c2w))
    w2c = jnp.asarray(np.stack(w2cs), jnp.float32)
    fl = jnp.float32(focal)
    labels = jnp.asarray(rng.integers(0, n_classes, (H, W)), jnp.int32)

    # All views inside one dispatch — amortizes the host->device dispatch
    # latency (~6 ms/view through this runtime).  The view loop is
    # python-unrolled, NOT lax.scan: Mosaic kernels inside a scan body
    # yield corrupted (empty) outputs on the current TPU runtime
    # (docs/DESIGN.md "Mosaic operand-fusion hazard").
    @jax.jit
    def all_views(tri, w2cs_, labels):
        def one(w2c_k):
            cam_tris = transform_to_camera(tri, w2c_k)
            p2f = rasterize_triangles(
                cam_tris, fl, image_w=W, image_h=H, config=config
            )
            return project_image_class_counts(
                p2f, labels, n_faces=n_faces, n_classes=n_classes
            )

        acc = jnp.zeros((n_faces, n_classes), jnp.float32)
        for k in range(n_views):
            acc = acc + one(w2cs_[k])
        return acc

    # compile + warm up — and refuse to time a silently-empty pipeline
    # (a runtime upgrade once corrupted Mosaic outputs to all-background;
    # see docs/DESIGN.md "Mosaic operand-fusion hazard")
    acc = all_views(tri, w2c, labels)
    warm_sum = float(np.asarray(jnp.sum(acc)))
    expected_min = 0.5 * n_views * H * W  # >=50% pixel coverage
    if not warm_sum >= expected_min:
        raise RuntimeError(
            f"benchmark pipeline produced near-empty output "
            f"(sum={warm_sum}, expected >= {expected_min}); refusing to "
            "report a timing for broken compute"
        )

    t0 = time.perf_counter()
    total = all_views(tri, w2c, labels)
    np.asarray(jnp.sum(total))
    dt = time.perf_counter() - t0

    views_per_sec = n_views / dt
    n_dev = jax.device_count()
    # target: 100 views/s on 8 chips -> 12.5 views/s per chip
    target = 12.5 * n_dev if on_tpu else None
    vs_baseline = views_per_sec / target if target else 0.0
    print(
        json.dumps(
            {
                "metric": "4K views rasterized+aggregated per second (1M-face mesh)"
                if on_tpu
                else "smoke views/s (CPU, reduced scale)",
                "value": round(views_per_sec, 3),
                "unit": "views/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
