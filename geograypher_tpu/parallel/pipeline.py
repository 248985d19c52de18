"""Distributed aggregation pipeline: host image loading overlapped with
sharded device compute.

The production path for ``aggregate_images`` at survey scale: a thread
pool loads + segments label images ahead of the device (cv2/PIL release
the GIL), class-index images are shipped as int8 (1 byte/pixel), and each
device in the view-axis mesh rasterizes + aggregates its own views with
the FUSED scatter-free kernel chain (``ops.rasterize.rasterize_and_count``
— the raster kernel emits per-tile class counts, face-block fold kernels
densify them; no XLA scatter ever consumes a Mosaic output, per the
docs/DESIGN.md corruption doctrine).  Per-face accumulators stay DEVICE
RESIDENT across view groups (one host fetch at the end) and are
psum-combined over ICI inside each step.

Lens distortion is applied IN the rasterizer (vertices warped into the
sensor's distorted pixel space — ``setup_from_soa(distortion=...)``),
matching the single-device production path; the reference instead warps
the rendered map through a NN remap (meshes.py:1805-1821), which this
supersedes with sub-pixel accuracy at survey triangle sizes.

Semantics match ``TexturedMesh.aggregate_projected_images`` over one-hot
segmentor images exactly: each view contributes its per-face class
fraction (class pixel counts / face pixel count — the per-view mean of
the one-hot image), and the cross-view result averages those per-view
fractions over the views that saw the face (VIEW-weighted, exactly like
``ops.aggregate.accumulate_view`` / ``finalize_aggregation``), not a
pixel-weighted pool of raw counts.
"""

from __future__ import annotations

import concurrent.futures
import typing

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    rasterize_and_count,
    setup_from_soa,
    tri_to_soa,
)
from geograypher_tpu.parallel.sharding import VIEW_AXIS, make_view_mesh


def aggregate_class_images_distributed(
    mesh,
    cameras,
    n_classes: int,
    class_image_provider: typing.Optional[typing.Callable[[int], np.ndarray]] = None,
    aggregate_img_scale: float = 1.0,
    device_mesh: typing.Optional[Mesh] = None,
    prefetch_workers: int = 4,
    config: typing.Optional[RasterConfig] = None,
    apply_distortion: typing.Optional[bool] = None,
):
    """Aggregate per-view class images onto mesh faces across all devices.

    Args:
        mesh: TexturedMesh.
        cameras: CameraSet (or SegmentorCameraSet).
        n_classes: number of classes in the label images.
        class_image_provider: ``f(view_index) -> (H, W)`` integer class
            image (negative/255 = unlabeled).  Defaults to argmaxing
            ``cameras.get_image_by_index`` (segmentor one-hots).
        aggregate_img_scale: label/raster scale fraction.
        device_mesh: jax device mesh (defaults to all devices).
        apply_distortion: None (default) rasterizes each view directly in
            the sensor's distorted pixel space whenever the sensor is
            calibrated with distortion (reference behavior:
            meshes.py:1805-1821, via NN remap there); False disables.

    Returns (fraction_sums (F, n_classes), view_counts (F,)) as numpy
    arrays: ``fraction_sums`` is the sum over views of each view's
    per-face class fraction; the cross-view average is
    ``fraction_sums / view_counts`` (NaN where ``view_counts == 0``),
    identical to ``TexturedMesh.aggregate_projected_images``.
    """
    if device_mesh is None:
        device_mesh = make_view_mesh()
    n_dev = device_mesh.devices.size
    config = config or mesh.raster_config
    n_faces = mesh.n_faces
    tri_soa = jnp.asarray(tri_to_soa(mesh.get_tri_verts_device(cameras)))
    batch = cameras.get_camera_batch(image_scale=aggregate_img_scale)
    h, w = batch.image_height, batch.image_width

    if class_image_provider is None:

        def class_image_provider(i: int) -> np.ndarray:
            img = np.asarray(cameras.get_image_by_index(i, aggregate_img_scale))
            if img.ndim == 3:
                finite = np.isfinite(img).all(axis=-1)
                cls = np.argmax(np.nan_to_num(img), axis=-1)
                return np.where(finite, cls, -1).astype(np.int32)
            return np.nan_to_num(img, nan=-1).astype(np.int32)

    sharding = NamedSharding(device_mesh, P(VIEW_AXIS))
    replicated = NamedSharding(device_mesh, P())

    dist_all = np.asarray(batch.distortion, np.float32)  # (N, 8)
    pcx_all = np.asarray(batch.cx, np.float32)
    pcy_all = np.asarray(batch.cy, np.float32)
    use_dist = bool(
        (apply_distortion is None or apply_distortion)
        and (np.any(dist_all) or np.any(pcx_all) or np.any(pcy_all))
    )

    @jax.jit
    def device_step(
        tri_soa, w2c_shard, f_shard, dist_shard, pcx_shard, pcy_shard,
        valid_shard, imgs_shard, acc_fracs, acc_views,
    ):
        def per_device(
            tri_soa, w2c_b, f_b, dist_b, pcx_b, pcy_b, valid_b, imgs_b,
            acc_fracs, acc_views,
        ):
            # collapse the (local-shard=1, steps) leading axes
            w2c_b = w2c_b.reshape(-1, 4, 4)
            f_b = f_b.reshape(-1)
            dist_b = dist_b.reshape(-1, 8)
            pcx_b = pcx_b.reshape(-1)
            pcy_b = pcy_b.reshape(-1)
            valid_b = valid_b.reshape(-1)
            imgs_b = imgs_b.reshape((-1,) + imgs_b.shape[2:])

            fracs = jnp.zeros((n_faces, n_classes), jnp.float32)
            views = jnp.zeros((n_faces,), jnp.float32)
            # python-unrolled view loop: Mosaic kernels inside lax.scan
            # corrupt on the current runtime (docs/DESIGN.md)
            for k in range(w2c_b.shape[0]):
                setup = setup_from_soa(
                    tri_soa, w2c_b[k], f_b[k], w, h, config.znear,
                    distortion=(
                        (dist_b[k], pcx_b[k], pcy_b[k]) if use_dist else None
                    ),
                )
                counts = rasterize_and_count(
                    setup, imgs_b[k].astype(jnp.int32), config, h, w,
                    n_faces, n_classes,
                )
                counts = counts * valid_b[k]
                face_total = jnp.sum(counts, axis=1)
                seen = (face_total > 0).astype(jnp.float32)
                # per-view class fraction: this view's vote, weighted
                # equally with every other view that saw the face
                fracs = fracs + counts / jnp.maximum(face_total, 1.0)[:, None]
                views = views + seen
            return (
                acc_fracs + jax.lax.psum(fracs, VIEW_AXIS),
                acc_views + jax.lax.psum(views, VIEW_AXIS),
            )

        return jax.shard_map(
            per_device,
            mesh=device_mesh,
            in_specs=(
                P(), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS),
                P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(tri_soa, w2c_shard, f_shard, dist_shard, pcx_shard, pcy_shard,
          valid_shard, imgs_shard, acc_fracs, acc_views)

    n = len(cameras)
    n_pad = -(-n // n_dev) * n_dev
    order = list(range(n)) + [0] * (n_pad - n)
    valid = np.array([1.0] * n + [0.0] * (n_pad - n), np.float32)
    w2c_all = np.asarray(batch.world_to_cam)
    f_all = np.asarray(batch.f)
    img_dtype = np.int8 if n_classes < 128 else np.int32

    total_fracs = jax.device_put(
        jnp.zeros((n_faces, n_classes), jnp.float32), replicated
    )
    total_views = jax.device_put(jnp.zeros((n_faces,), jnp.float32), replicated)

    with concurrent.futures.ThreadPoolExecutor(prefetch_workers) as pool:
        futures: dict = {}

        def ensure(i: int):
            if i not in futures and i < n_pad:
                futures[i] = pool.submit(class_image_provider, order[i])

        window = n_dev * 3  # slots kept in flight ahead of the device
        for i in range(min(n_pad, window)):
            ensure(i)
        for start in range(0, n_pad, n_dev):
            idx = list(range(start, start + n_dev))
            imgs = np.stack(
                [
                    np.clip(futures.pop(i).result(), -1, None).astype(
                        img_dtype
                    )
                    for i in idx
                ],
                axis=0,
            )
            for j in range(start + n_dev, min(start + n_dev + window, n_pad)):
                ensure(j)
            sel = [order[i] for i in idx]
            # reshape per-device leading dim: (n_dev, 1, ...) so the view
            # loop runs once per step per device
            total_fracs, total_views = device_step(
                tri_soa,
                jax.device_put(w2c_all[sel][:, None], sharding),
                jax.device_put(f_all[sel][:, None], sharding),
                jax.device_put(dist_all[sel][:, None], sharding),
                jax.device_put(pcx_all[sel][:, None], sharding),
                jax.device_put(pcy_all[sel][:, None], sharding),
                jax.device_put(valid[idx][:, None], sharding),
                jax.device_put(jnp.asarray(imgs[:, None]), sharding),
                total_fracs,
                total_views,
            )
    return np.asarray(total_fracs), np.asarray(total_views)
