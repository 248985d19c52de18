"""Microbench the host<->device link + dispatch primitives the streaming
pipeline is built on (VERDICT r4 #5: dense pipeline measures 0.88 views/s
where the ~40 MB/s tunnel alone permits ~4.8 — find the other 75%).

Times, on the real backend:
  1. device_put bandwidth + latency for int8 payloads (0.5 .. 33 MB)
  2. device_put of an RLE pair (starts int32 + deltas int8, bench-sized)
  3. dispatch+sync latency of a trivial jitted fn (per-step overhead)
  4. np.asarray scalar fetch RTT (the sync primitive)
  5. device-resident compute: one fused 4K view step (no transfer)
  6. overlap test: device_put from a worker thread WHILE the device runs
     compute — measures whether the tunnel and compute actually overlap

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_transfer.py
"""

import concurrent.futures
import sys
import time

import numpy as np


def sync_scalar(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32).ravel()[:16])))


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # 4. scalar fetch RTT
    one = jnp.ones((8,), jnp.float32)
    sync_scalar(one)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        sync_scalar(one)
    rtt = (time.perf_counter() - t0) / reps
    print(f"scalar fetch RTT: {rtt*1e3:.1f} ms")

    # 1. device_put bandwidth/latency
    for mb in (0.5, 2.0, 8.3, 33.2):
        n = int(mb * 1e6)
        host = np.zeros(n, np.int8)
        d = jax.device_put(host)
        sync_scalar(d)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            d = jax.device_put(host)
            sync_scalar(d)
        dt = (time.perf_counter() - t0) / reps
        print(f"device_put {mb:5.1f} MB: {dt*1e3:7.0f} ms  "
              f"({mb/dt:6.1f} MB/s incl sync)")

    # 2. RLE-sized put (bench coherent labels ~ 2k-40k runs)
    for cap in (8192, 65536):
        starts = np.zeros(cap, np.int32)
        deltas = np.zeros(cap, np.int8)
        a = jax.device_put(starts); b = jax.device_put(deltas)
        sync_scalar(a)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            a = jax.device_put(starts)
            b = jax.device_put(deltas)
            sync_scalar(a); sync_scalar(b)
        dt = (time.perf_counter() - t0) / reps
        print(f"rle put cap={cap}: {dt*1e3:.0f} ms ({5*cap/1e6:.2f} MB)")

    # 3. dispatch latency of a trivial program
    @jax.jit
    def triv(x):
        return x + 1.0

    x = jnp.zeros((128,), jnp.float32)
    sync_scalar(triv(x))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        x = triv(x)
    sync_scalar(x)
    disp = (time.perf_counter() - t0) / reps
    print(f"trivial dispatch (pipelined x20): {disp*1e3:.1f} ms/step")

    # 5 + 6. compute one fused 4K view with device-resident labels, then
    # overlap a device_put with queued compute
    from geograypher_tpu.ops.rasterize import (
        RasterConfig, setup_from_soa, bin_all, fused_counts_pallas,
        tri_to_soa,
    )
    from geograypher_tpu.ops.agg_tiled import fold_tile_counts
    from geograypher_tpu.utils.fixtures import (
        gather_tri_verts, make_grid_mesh, nadir_camera,
    )
    from geograypher_tpu.utils.geometric import serpentine_face_order

    H, W = 2160, 3840
    verts, faces = make_grid_mesh(
        n=708, size=4.0,
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
    cfg = RasterConfig(
        caps=(48, 16, 16, 16), backend="pallas", bin_block=8,
        l0_window=(5, 2), fold_w_cap=504, fold_block=4096,
    )
    w2c = jnp.asarray(np.linalg.inv(nadir_camera(4.0, 2000.0, W)), jnp.float32)
    lab = jax.random.randint(jax.random.PRNGKey(0), (H, W), 0, 10, jnp.int32)

    @jax.jit
    def one_view(tri, w2c, lab):
        setup = setup_from_soa(tri, w2c, 2000.0, W, H, cfg.znear)
        binned, sb = bin_all(setup, cfg, H, W)
        outs = fused_counts_pallas(setup, binned, sb, lab, cfg, H, W, 10)
        counts, _ = fold_tile_counts(
            outs, binned, cfg, H, W, f_pad, 10,
            w_cap=cfg.fold_w_cap, block=cfg.fold_block,
            return_overflow=True,
        )
        return jnp.sum(counts)

    sync_scalar(one_view(tri, w2c, lab))
    t0 = time.perf_counter()
    reps = 5
    acc = None
    for _ in range(reps):
        acc = one_view(tri, w2c, lab)
    sync_scalar(acc)
    per_view = (time.perf_counter() - t0) / reps
    print(f"device-resident fused view (nadir, caps 48): "
          f"{per_view*1e3:.0f} ms/view")

    # overlap: queue 5 compute steps, then device_put 8.3 MB from this
    # thread; if transfer and compute overlap, total ~= max(compute, put)
    host = np.zeros(int(8.3e6), np.int8)
    t0 = time.perf_counter()
    outs = [one_view(tri, w2c, lab) for _ in range(5)]
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = jax.device_put(host)
    sync_scalar(d)
    t_put = time.perf_counter() - t0
    t0 = time.perf_counter()
    for o in outs:
        sync_scalar(o)
    t_drain = time.perf_counter() - t0
    print(f"overlap: dispatch5 {t_disp*1e3:.0f} ms, put-during-compute "
          f"{t_put*1e3:.0f} ms, drain {t_drain*1e3:.0f} ms "
          f"(serial would be ~{(5*per_view)*1e3:.0f} ms compute)")


if __name__ == "__main__":
    main()
